"""Training loop (L7): orbax checkpoints, telemetry, preemption handling.

Re-design of the reference trainer (`mvtracker/cli/train.py:342-1013`):

- auto-resume from the latest checkpoint in the experiment dir
  (reference :575-601) via orbax CheckpointManager;
- SIGUSR1/SIGTERM handler checkpoints and exits cleanly for preemption
  (reference :636-654);
- per-step phase timing (data/step) with mean/median/std logged every
  `telemetry_freq` steps (reference :889-976);
- adaptive refinement-iteration schedule: warmup -> 1 iter, then 10% one
  iter / 15% random middle / 75% full (reference `augment_train_iters`,
  :317-339) — each distinct iteration count is a separate cached jit
  specialization;
- crash forensics: on exception, checkpoint + dump the offending batch
  (reference :741-766).

Distribution: the step itself is SPMD over the ("data", "model") mesh
(see `training/step.py`); this loop is mesh-agnostic host orchestration.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import signal
import time
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvtracker_tpu.parallel import mesh as mesh_lib
from mvtracker_tpu.training import step as step_lib
from mvtracker_tpu.utils import observability as obs


@dataclasses.dataclass
class TrainConfig:
    """Mirrors the reference's trainer config surface
    (`configs/train.yaml:31-48`, `cli/train.py:55-75`)."""

    total_steps: int = 200_000
    lr: float = 5e-4
    weight_decay: float = 1e-5
    schedule: str = "cos"
    grad_clip: float = 1.0
    gamma: float = 0.8  # sequence-loss discount
    visibility_loss_weight: float = 0.1
    # Aux contrastive point-identity loss on encoder features (round 4,
    # losses.feature_identity_loss); 0 = reference parity.
    feat_id_loss_weight: float = 0.0
    train_iters: int = 4
    warmup_steps: int = 100
    save_ckpt_freq: int = 500
    eval_freq: int = 10_000
    telemetry_freq: int = 100
    seed: int = 0
    exp_dir: str = "experiments/default"
    adaptive_iters: bool = True
    keep_ckpts: int = 3
    # Optional static-pretrain phase (reference `cli/train.py:501-536`):
    # the first N steps draw from a second, static-scene iterator.
    static_pretrain_steps: int = 0
    tensorboard: bool = True  # per-step scalars to <exp_dir>/tb (reference `train.py:622`)
    # Faulthandler hang watchdog (reference `cli/utils/helpers.py:45-47`,
    # `configs/train.yaml:106-110`): dump all stacks if a step makes no
    # progress for this long. 0 disables.
    watchdog_timeout_s: float = 600.0
    # Hard-kill the process after the watchdog dump (for supervised runs
    # where an external loop restarts from the latest checkpoint; see
    # `scripts/run_supervised_train.sh`). Without this, a wedged device
    # tunnel leaves the process blocked forever in a device fetch.
    watchdog_exit: bool = False
    # Deadline for the FIRST step only (covers cold XLA compile; see the
    # install site in `fit`).
    watchdog_first_deadline_s: float = 1800.0
    # Reprojection round-trip sanity guard (reference `cli/train.py:194-204`
    # computes the world->pixel+z->world round trip and WARNS when it
    # deviates beyond atol=1; it does not abort). The deviation is computed
    # in-graph (`training/step.py::scene_loss`) and checked here host-side:
    # warn per offending step, raise only after `reproj_guard_patience`
    # CONSECUTIVE offending steps — a transiently-diverged step (early
    # training, f32 round-trip error scaling with |coords|) keeps training,
    # while a deterministic camera-plumbing bug still stops the run instead
    # of silently training on garbage. atol 0 disables.
    reproj_guard_atol: float = 1.0
    reproj_guard_patience: int = 5
    # Optional Weights & Biases mirroring of the TensorBoard stream
    # (reference `cli/train.py:373-381` with sync_tensorboard=True).
    # Gracefully disabled when wandb is not installed / offline.
    wandb: bool = False
    wandb_project: str = "mvtracker_tpu"
    # jax.profiler trace window: capture a device/HLO timeline trace over
    # `profile_n_steps` steps starting at `profile_start_step` into
    # <exp_dir>/profile (TensorBoard profile plugin). -1 disables. The
    # reference has no profiler at all (SURVEY §5); this is the TPU-native
    # upgrade over its manual phase timing.
    profile_start_step: int = -1
    profile_n_steps: int = 3
    # Warm-start model weights from a file before training (reference
    # `cli/train.py:603-620`): a flax .msgpack (cli/convert.py output) or
    # a torch .pth reference checkpoint. Non-strict fallback on mismatch.
    # Applied only when no auto-resume checkpoint exists. "" disables.
    warm_start_ckpt: str = ""
    # Host->device pipelining: fetch the loss (a device sync) only every
    # N steps. With a per-step fetch the next batch's host->device
    # transfer serializes behind the previous step's compute; letting the
    # dispatch run ahead overlaps them (measured on the tunneled v5e at
    # the r3 flagship config: ~480 -> ~170 ms/step wall). Loss/guard
    # checks then sample every Nth step — the non-finite and reprojection
    # guards still stop a broken run, N steps later at worst. 1 restores
    # the reference's per-step behavior.
    sync_every: int = 1


def augment_train_iters(step: int, cfg: TrainConfig, rng: np.random.Generator) -> int:
    """Adaptive refinement-iteration count; mirrors reference
    `cli/train.py:317-339`."""
    if not cfg.adaptive_iters:
        return cfg.train_iters
    if step < cfg.warmup_steps:
        return 1
    r = rng.random()
    if r < 0.10:
        return 1
    if r < 0.25 and cfg.train_iters > 2:
        return int(rng.integers(2, cfg.train_iters))
    return cfg.train_iters


class Trainer:
    def __init__(
        self,
        model,
        cfg: TrainConfig,
        mesh=None,
        shard_views: bool = False,
    ):
        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.shard_views = shard_views
        self.optimizer = step_lib.make_optimizer(
            lr=cfg.lr,
            weight_decay=cfg.weight_decay,
            total_steps=cfg.total_steps,
            grad_clip=cfg.grad_clip,
            schedule=cfg.schedule,
        )
        self._steps = {}  # iters -> jitted train step
        self._stop_requested = False
        self._ckpt_mgr = None
        self._tb = None

    def _tb_writer(self):
        if self._tb is None and self.cfg.tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(self.cfg.exp_dir, "tb"))
            except Exception:  # pragma: no cover
                self.cfg.tensorboard = False
        return self._tb

    # -- checkpointing -------------------------------------------------
    def _ckpt_manager(self):
        if self._ckpt_mgr is None:
            import orbax.checkpoint as ocp

            path = os.path.abspath(os.path.join(self.cfg.exp_dir, "checkpoints"))
            os.makedirs(path, exist_ok=True)
            self._ckpt_mgr = ocp.CheckpointManager(
                path,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.cfg.keep_ckpts, create=True
                ),
            )
        return self._ckpt_mgr

    def save(self, state: step_lib.TrainState, step: int):
        import orbax.checkpoint as ocp

        mgr = self._ckpt_manager()
        mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        mgr.wait_until_finished()
        logging.info("saved checkpoint at step %d", step)

    @staticmethod
    def _migrate_updateformer_layout(loaded: dict, current: dict) -> dict:
        """Stack a pre-scan checkpoint's unrolled updateformer blocks
        (time_i / sv2p_i / svirt_i / sp2v_i) into the scanned 'layers'
        layout when the current model expects it (param-layout change when
        the depth loop became one nn.scan; see updateformer._UpdateLayer)."""
        try:
            uf = loaded["params"]["updateformer"]
            cur_uf = current["params"]["updateformer"]
        except (KeyError, TypeError):
            return loaded
        if "layers" in uf or "layers" not in cur_uf or "time_0" not in uf:
            return loaded
        depth = len([k for k in uf if k.startswith("time_")])

        def stack(trees):
            return {
                k: stack([t[k] for t in trees])
                if isinstance(v, dict)
                else np.stack([np.asarray(t[k]) for t in trees])
                for k, v in trees[0].items()
            }

        layers = [
            {
                "time": uf.pop(f"time_{i}"),
                "sv2p": uf.pop(f"sv2p_{i}"),
                "svirt": uf.pop(f"svirt_{i}"),
                "sp2v": uf.pop(f"sp2v_{i}"),
            }
            for i in range(depth)
        ]
        uf["layers"] = stack(layers)
        logging.info(
            "warm-start: migrated %d unrolled updateformer blocks to the "
            "scanned layout", depth,
        )
        return loaded

    def _migrate_corr_width(self, loaded: dict, current: dict) -> dict:
        """Expand a uniform-k checkpoint's update-transformer input
        projection to this model's per-level neighbor counts
        (`corr_neighbors_per_level`).

        The input feature layout is [flow_embed | per-level corr chunks
        (neighbor-major: K_l ranks x F features) | track feats | mask+vis]
        (`MVTracker.forward_iteration`). Rows for neighbor ranks the old
        checkpoint had are copied into their new positions; rows for the
        added ranks are zero-initialized, so the warm-started model
        computes exactly what the old one did until training learns to
        use the extra neighbors. Only fires when the row-count difference
        is exactly attributable to corr width; anything else falls through
        to the non-strict merge (which will then flag the mismatch).
        """
        model = self.model
        if getattr(model, "corr_neighbors_per_level", None) is None:
            return loaded
        try:
            old_kern = np.asarray(
                loaded["params"]["updateformer"]["input_transform"]["kernel"]
            )
            cur_kern = current["params"]["updateformer"]["input_transform"]["kernel"]
        except (KeyError, TypeError):
            return loaded
        d_old, d_new = old_kern.shape[0], cur_kern.shape[0]
        if d_old == d_new:
            return loaded
        fe = (model.flow_embed_dim + 1) * 3
        tail = model.fmaps_dim + 2
        f = model.corr_feat_width
        levels = model.corr_n_levels
        corr_rows_old = d_old - fe - tail
        if corr_rows_old <= 0 or corr_rows_old % (f * levels) != 0:
            return loaded
        k_old = corr_rows_old // (f * levels)
        new_kern = np.zeros((d_new,) + old_kern.shape[1:], old_kern.dtype)
        new_kern[:fe] = old_kern[:fe]
        src = fe
        dst = fe
        for lvl in range(levels):
            k_new = model.corr_k(lvl)
            ncopy = min(k_old, k_new) * f
            new_kern[dst : dst + ncopy] = old_kern[src : src + ncopy]
            src += k_old * f
            dst += k_new * f
        new_kern[dst:] = old_kern[src:]
        loaded["params"]["updateformer"]["input_transform"]["kernel"] = new_kern
        logging.info(
            "warm-start: migrated input_transform %d -> %d rows (uniform k=%d "
            "-> per-level %s, new neighbor rows zero-init)",
            d_old, d_new, k_old, tuple(model.corr_k(l) for l in range(levels)),
        )
        return loaded

    def warm_start(
        self, state: step_lib.TrainState, path: str, strict: bool = False
    ) -> step_lib.TrainState:
        """Initialize model weights from a file before training.

        Mirrors the reference's warm-start path (`cli/train.py:603-620`):
        accepts a flax .msgpack params file (cli/convert.py output) or a
        torch .pth reference checkpoint (converted on the fly). Strict when
        every leaf matches; otherwise falls back to non-strict merging of
        the intersecting, shape-matching leaves with a warning per skipped
        leaf (the reference's strict -> non-strict fallback). With
        `strict=True` a partial load RAISES instead — evaluation paths use
        this so mismatched model flags can never silently report metrics
        from partially-initialized params.
        """
        import flax.serialization
        import flax.traverse_util as tru

        if path.endswith((".pth", ".pt")):
            from mvtracker_tpu.convert import load_reference_checkpoint

            loaded = load_reference_checkpoint(path)
        else:
            with open(path, "rb") as f:
                # Untemplated decode: msgpack restores a plain nested dict.
                loaded = flax.serialization.msgpack_restore(f.read())
        loaded = self._migrate_updateformer_layout(loaded, state.params)
        loaded = self._migrate_corr_width(loaded, state.params)

        cur = tru.flatten_dict(state.params, sep="/")
        new = tru.flatten_dict(loaded, sep="/")
        merged, used, skipped = dict(cur), 0, 0
        skipped_keys = []
        for k, v in new.items():
            if k in cur and tuple(cur[k].shape) == tuple(np.asarray(v).shape):
                merged[k] = jnp.asarray(v, cur[k].dtype)
                used += 1
            else:
                skipped += 1
                skipped_keys.append(k)
                logging.warning("warm-start: skipping %s %s", k, np.asarray(v).shape)
        missing = len(cur) - used
        if skipped or missing:
            if strict:
                missing_keys = sorted(set(cur) - {k for k in new if k in cur})
                raise ValueError(
                    f"strict warm-start from {path}: {skipped} leaves skipped "
                    f"{skipped_keys[:8]}, {missing} left at init "
                    f"{missing_keys[:8]} — model config does not match the "
                    "checkpoint"
                )
            logging.warning(
                "warm-start non-strict: %d loaded, %d skipped, %d left at init",
                used, skipped, missing,
            )
        else:
            logging.info("warm-start strict: all %d leaves loaded from %s", used, path)
        params = tru.unflatten_dict(merged, sep="/")
        return step_lib.TrainState(params, state.opt_state, state.step)

    def restore_latest(self, state: step_lib.TrainState) -> tuple[step_lib.TrainState, int]:
        """Auto-resume (reference `cli/train.py:575-601`)."""
        import orbax.checkpoint as ocp

        mgr = self._ckpt_manager()
        latest = mgr.latest_step()
        if latest is None:
            return state, 0
        restored = mgr.restore(
            latest, args=ocp.args.StandardRestore(state._asdict())
        )
        logging.info("resumed from checkpoint step %d", latest)
        return step_lib.TrainState(**restored), latest

    # -- main loop -----------------------------------------------------
    def _get_step_fn(self, iters: int):
        if iters not in self._steps:
            self._steps[iters] = step_lib.make_train_step(
                self.model,
                self.optimizer,
                iters=iters,
                gamma=self.cfg.gamma,
                vis_weight=self.cfg.visibility_loss_weight,
                feat_id_weight=self.cfg.feat_id_loss_weight,
                mesh=self.mesh,
                shard_views=self.shard_views,
            )
        return self._steps[iters]

    def _install_signal_handlers(self):
        def handler(signum, frame):
            logging.warning("signal %d received: checkpoint-and-exit requested", signum)
            self._stop_requested = True

        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):  # non-main thread
                pass

    def fit(
        self,
        data_iter: Iterator[dict],
        state: Optional[step_lib.TrainState] = None,
        eval_fn: Optional[Callable[[step_lib.TrainState, int], dict]] = None,
        max_steps: Optional[int] = None,
        static_data_iter: Optional[Iterator[dict]] = None,
    ) -> step_lib.TrainState:
        cfg = self.cfg
        rng = np.random.default_rng(cfg.seed)
        self._install_signal_handlers()
        os.makedirs(cfg.exp_dir, exist_ok=True)
        if cfg.watchdog_timeout_s > 0:
            # First deadline gets a cold-compile grace: the first step
            # includes the train-step XLA compile (~2.5 min for the medium
            # config on v5e; an interrupted compile writes nothing to the
            # persistent cache, so killing mid-compile would loop forever
            # under a restart supervisor). Per-step resets use the normal
            # timeout.
            obs.install_hang_watchdog(
                max(cfg.watchdog_timeout_s, cfg.watchdog_first_deadline_s),
                exit=cfg.watchdog_exit,
            )
        wandb_run = None
        if cfg.wandb:
            try:
                import wandb

                wandb_run = wandb.init(
                    project=cfg.wandb_project,
                    dir=cfg.exp_dir,
                    config=dataclasses.asdict(cfg),
                    sync_tensorboard=True,
                )
            except Exception:
                logging.warning("wandb requested but unavailable; continuing without")

        if state is None:
            first = next(data_iter)
            example = {k: v[0] for k, v in first.items() if hasattr(v, "ndim") and v.ndim > 0}
            state = step_lib.init_state(
                self.model,
                self.optimizer,
                example,
                jax.random.PRNGKey(cfg.seed),
                iters=cfg.train_iters,
            )
        if cfg.warm_start_ckpt and self._ckpt_manager().latest_step() is None:
            state = self.warm_start(state, cfg.warm_start_ckpt)
        state, start_step = self.restore_latest(state)

        total = max_steps if max_steps is not None else cfg.total_steps
        data_times, step_times = [], []
        step = start_step
        reproj_bad_streak = 0
        profiler = None
        if cfg.profile_start_step >= 0:
            profiler = obs.ProfilerTraceWindow(
                os.path.join(cfg.exp_dir, "profile"),
                start=cfg.profile_start_step,
                n_steps=cfg.profile_n_steps,
            )
        try:
            while step < total and not self._stop_requested:
                if profiler is not None:
                    profiler.step(step)
                t0 = time.perf_counter()
                # Static-pretrain phase (reference `cli/train.py:501-536`).
                use_static = (
                    static_data_iter is not None
                    and step < cfg.static_pretrain_steps
                )
                batch = next(static_data_iter if use_static else data_iter)
                if self.mesh is not None:
                    batch = mesh_lib.shard_batch_pytree(batch, self.mesh)
                t1 = time.perf_counter()

                iters = augment_train_iters(step, cfg, rng)
                step_fn = self._get_step_fn(iters)
                state, metrics = step_fn(state, batch)
                # Device sync (loss fetch) only every sync_every steps: an
                # unsynced dispatch lets the NEXT batch's host->device
                # transfer overlap this step's compute (see TrainConfig.
                # sync_every). Telemetry/guard/TB steps always sync.
                do_sync = (
                    cfg.sync_every <= 1
                    or (step + 1) % cfg.sync_every == 0
                    or (step + 1) % cfg.telemetry_freq == 0
                    or (step + 1) % cfg.save_ckpt_freq == 0
                    or (eval_fn is not None and (step + 1) % cfg.eval_freq == 0)
                    or (step + 1) >= total
                )
                if do_sync:
                    loss = float(metrics["loss"])  # blocks; the sync point
                t2 = time.perf_counter()

                data_times.append(t1 - t0)
                step_times.append(t2 - t1)
                step += 1
                if cfg.watchdog_timeout_s > 0:
                    obs.reset_hang_watchdog(cfg.watchdog_timeout_s, exit=cfg.watchdog_exit)

                if not do_sync:
                    continue
                if not np.isfinite(loss):
                    raise FloatingPointError(f"non-finite loss at step {step}: {loss}")
                if cfg.reproj_guard_atol > 0 and "reproj_dev" in metrics:
                    rdev = float(metrics["reproj_dev"])
                    if not rdev < cfg.reproj_guard_atol:
                        reproj_bad_streak += 1
                        logging.warning(
                            "reprojection round-trip deviation %.3g exceeds "
                            "atol %g at step %d (%d/%d consecutive before "
                            "abort)", rdev, cfg.reproj_guard_atol, step,
                            reproj_bad_streak, cfg.reproj_guard_patience,
                        )
                        if reproj_bad_streak >= cfg.reproj_guard_patience:
                            raise FloatingPointError(
                                f"reprojection round-trip deviation {rdev:.3g} "
                                f"exceeded atol {cfg.reproj_guard_atol} for "
                                f"{reproj_bad_streak} consecutive steps "
                                "(intrinsics/extrinsics mis-application upstream?)"
                            )
                    else:
                        reproj_bad_streak = 0

                tb = self._tb_writer()
                if tb is not None:
                    tb.add_scalar("train/loss", loss, step)
                    for k in ("xyz_loss", "vis_loss", "grad_norm"):
                        if k in metrics:
                            tb.add_scalar(f"train/{k}", float(metrics[k]), step)

                if step % cfg.telemetry_freq == 0:
                    mem = obs.device_memory_stats()
                    if mem and tb is not None:
                        peak = max(m["peak_bytes_in_use_mb"] for m in mem.values())
                        tb.add_scalar("sys/peak_hbm_mb", peak, step)
                    dt, st = np.asarray(data_times), np.asarray(step_times)
                    logging.info(
                        "step %d loss=%.4f xyz=%.4f vis=%.4f | data %.0f/%.0f/%.0f ms "
                        "step %.0f/%.0f/%.0f ms (mean/med/std)",
                        step,
                        loss,
                        float(metrics.get("xyz_loss", np.nan)),
                        float(metrics.get("vis_loss", np.nan)),
                        dt.mean() * 1e3, np.median(dt) * 1e3, dt.std() * 1e3,
                        st.mean() * 1e3, np.median(st) * 1e3, st.std() * 1e3,
                    )
                    data_times, step_times = [], []

                # Checkpoint saves and in-training evals legitimately exceed
                # the per-step deadline (eval pays a cold compile for its own
                # graph): re-arm with the first-step grace for their duration
                # so the watchdog doesn't kill a healthy run mid-eval, then
                # drop back to the per-step deadline.
                long_block = step % cfg.save_ckpt_freq == 0 or (
                    eval_fn is not None and step % cfg.eval_freq == 0
                )
                if long_block and cfg.watchdog_timeout_s > 0:
                    obs.reset_hang_watchdog(
                        max(cfg.watchdog_timeout_s, cfg.watchdog_first_deadline_s),
                        exit=cfg.watchdog_exit,
                    )
                if step % cfg.save_ckpt_freq == 0:
                    self.save(state, step)
                if eval_fn is not None and step % cfg.eval_freq == 0:
                    eval_fn(state, step)
                if long_block and cfg.watchdog_timeout_s > 0:
                    obs.reset_hang_watchdog(cfg.watchdog_timeout_s, exit=cfg.watchdog_exit)
        except Exception:
            # Crash forensics: checkpoint + dump batch (reference :741-766).
            crash_dir = os.path.join(cfg.exp_dir, "crash")
            os.makedirs(crash_dir, exist_ok=True)
            # Independent best-effort saves: a batch-dump failure (incl.
            # `batch` unbound when the very first data fetch raised) must
            # not also forfeit the crash checkpoint.
            try:
                np.savez(
                    os.path.join(crash_dir, f"batch_step{step}.npz"),
                    **{k: np.asarray(v) for k, v in batch.items()},
                )
            except Exception:
                logging.exception("failed to dump the crash batch")
            try:
                self.save(state, step)
            except Exception:
                logging.exception("failed to save the crash checkpoint")
            raise
        finally:
            if profiler is not None:
                profiler.close()
            if cfg.watchdog_timeout_s > 0:
                obs.cancel_hang_watchdog()
            if wandb_run is not None:  # reference `maybe_close_wandb`
                try:
                    wandb_run.finish()
                except Exception:
                    pass

        if self._stop_requested:
            self.save(state, step)
        return state
