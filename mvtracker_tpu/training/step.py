"""Sharded training step (L7).

Replaces the reference's Lightning-Fabric DDP loop body
(`mvtracker/cli/train.py:671-820`) with a single jitted SPMD step:

- scenes (batch) are vmapped and sharded over the mesh ``data`` axis;
  gradient synchronization is the all-reduce XLA inserts — the TPU
  equivalent of `fabric.backward`'s NCCL all-reduce (`train.py:787`);
- camera views are sharded over the ``model`` axis during CNN encoding
  (each device encodes a slice of the V streams), with the fused cloud
  all-gathered automatically before kNN;
- optimizer: AdamW + OneCycle with gradient clipping at 1.0, mirroring
  `cli/train.py:55-75,814-816`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mvtracker_tpu.training import losses
from mvtracker_tpu.utils import geometry


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def zero_nonfinite() -> optax.GradientTransformation:
    """Zero every non-finite (NaN or inf) gradient entry."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)), updates
        )
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    lr: float = 5e-4,
    weight_decay: float = 1e-5,
    total_steps: int = 200_000,
    pct_start: float = 0.05,
    grad_clip: float = 1.0,
    schedule: str = "cos",
) -> optax.GradientTransformation:
    """AdamW + OneCycle, mirroring reference `cli/train.py:55-75`."""
    # Degenerate-schedule guard: optax's onecycle places a boundary at
    # int(pct_start * total_steps); if that truncates to 0 the first
    # interpolation segment has zero width -> NaN learning rate -> NaN
    # params (observed with tiny smoke-test step counts). Keep the warmup
    # at least one step wide.
    total_steps = max(int(total_steps), 2)
    pct_start = max(pct_start, 1.0 / total_steps)
    if schedule == "cos":
        sched = optax.cosine_onecycle_schedule(
            transition_steps=total_steps, peak_value=lr, pct_start=pct_start
        )
    elif schedule == "linear":
        sched = optax.linear_onecycle_schedule(
            transition_steps=total_steps, peak_value=lr, pct_start=pct_start
        )
    elif schedule == "const":
        sched = lr
    else:
        raise ValueError(schedule)
    return optax.chain(
        # Non-finite guard first: a single inf/NaN gradient leaf would
        # otherwise poison the global norm and with it EVERY parameter
        # (observed: jit-sensitive backward inf). optax.zero_nans misses
        # infs, so zero anything non-finite. The reference's equivalent is
        # its runtime NaN drop-in (`mvtracker.py:401-404`).
        zero_nonfinite(),
        optax.clip_by_global_norm(grad_clip),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def init_state(model, optimizer, example_scene, rng_key, iters: int = 4) -> TrainState:
    # NOTE: flax init must be jitted — eager init dispatches thousands of
    # individual ops (pathological over a remote/tunneled TPU backend).
    params = jax.jit(
        lambda key, r, d, q, i, e: model.init(key, r, d, q, i, e, iters=iters, is_train=True)
    )(
        rng_key,
        example_scene["rgbs"],
        example_scene["depths"],
        example_scene["query_points"],
        example_scene["intrs"],
        example_scene["extrs"],
    )
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32))


def scene_loss(model, params, scene, iters: int, gamma: float, vis_weight: float,
               feat_id_weight: float = 0.0):
    """Loss for a single scene; the unit that gets vmapped over the batch.

    `rgbs` may arrive uint8 and `depths` float16 (compressed host->device
    transfer, `datasets.loader.compress_batch_for_transfer`): the casts
    back to f32 happen here on-device, where they are free.
    """
    out = model.apply(
        params,
        scene["rgbs"].astype(jnp.float32),
        scene["depths"].astype(jnp.float32),
        scene["query_points"],
        scene["intrs"],
        scene["extrs"],
        iters=iters,
        is_train=True,
    )
    num_frames = scene["rgbs"].shape[1]
    query_t = scene["query_points"][:, 0].astype(jnp.int32)
    total, parts = losses.tracking_loss(
        out["train_data"],
        scene["traj_gt"],
        scene["vis_gt"],
        scene["valid"],
        query_t,
        num_frames,
        gamma=gamma,
        track_upscaling_factor=scene.get("track_upscaling_factor", 1.0),
        visibility_loss_weight=vis_weight,
    )
    # Runtime reprojection sanity guard (reference `cli/train.py:194-204`):
    # computed in-graph (a few einsums), asserted host-side by the trainer
    # alongside the non-finite-loss check.
    parts = dict(parts)
    if feat_id_weight > 0.0:
        # Aux contrastive point-identity loss on encoder features (breaks
        # the corr-pathway chicken-and-egg; losses.feature_identity_loss).
        fmaps = model.apply(
            params, scene["rgbs"].astype(jnp.float32),
            method="compute_fmaps",
        )
        fid = losses.feature_identity_loss(
            fmaps, scene["depths"].astype(jnp.float32), scene["intrs"],
            scene["extrs"], scene["traj_gt"], stride=model.stride,
        )
        parts["feat_id"] = fid
        total = total + feat_id_weight * fid
    parts["reproj_dev"] = geometry.reprojection_roundtrip_dev(
        out["traj"], scene["intrs"], scene["extrs"]
    )
    return total, parts


def make_train_step(
    model,
    optimizer,
    iters: int = 4,
    gamma: float = 0.8,
    vis_weight: float = 0.1,
    feat_id_weight: float = 0.0,
    mesh=None,
    shard_views: bool = False,
    shard_tracks: bool = False,
):
    """Build the jitted SPMD train step: (state, batch) -> (state, metrics).

    `batch` is a pytree of arrays with a leading scene axis, sharded over
    the mesh "data" axis by the caller (`parallel.mesh.shard_batch_pytree`).

    Intra-scene sharding over the "model" axis (SURVEY §2.6 TPU-native
    plan): `shard_views` splits the V camera streams during CNN encoding;
    `shard_tracks` splits the N track blocks through kNN/correlation/
    transformer — the virtual-track cross-attention is the all-gather point.
    XLA's SPMD partitioner inserts the collectives for both.
    """

    def batch_loss(params, batch):
        if mesh is not None and (shard_views or shard_tracks):
            batch = dict(batch)
            if shard_views:
                # Views sharded over the model axis during encoding;
                # downstream re-gathers as needed.
                batch["rgbs"] = jax.lax.with_sharding_constraint(
                    batch["rgbs"], NamedSharding(mesh, P("data", "model"))
                )
            if shard_tracks:
                # Track blocks sharded over the model axis: query-dependent
                # tensors keep N split through correlation + refinement.
                batch["query_points"] = jax.lax.with_sharding_constraint(
                    batch["query_points"], NamedSharding(mesh, P("data", "model"))
                )
        per_scene = jax.vmap(
            lambda sc: scene_loss(
                model, params, sc, iters, gamma, vis_weight, feat_id_weight
            )
        )(batch)
        totals, parts = per_scene
        parts = dict(parts)
        # Deviations aggregate by max (a single bad scene must trip the
        # guard); losses aggregate by mean.
        reproj_dev = parts.pop("reproj_dev", None)
        agg = jax.tree.map(jnp.mean, parts)
        if reproj_dev is not None:
            agg["reproj_dev"] = jnp.max(reproj_dev)
        return jnp.mean(totals), agg

    @jax.jit
    def train_step(state: TrainState, batch):
        (loss, parts), grads = jax.value_and_grad(batch_loss, has_aux=True)(
            state.params, batch
        )
        updates, new_opt_state = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads), **parts}
        return TrainState(new_params, new_opt_state, state.step + 1), metrics

    return train_step
