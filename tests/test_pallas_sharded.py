"""Pallas kernels under the sharded SPMD step (VERDICT r2 #6).

Rounds 1-2 only ever exercised the sharded train step with the XLA kNN /
gather-corr fallbacks (the auto dispatch picks them on CPU meshes), so
`pallas_call` under the SPMD partitioner with sharded operands was
untested. Here the TPU kernels run in Pallas INTERPRET mode on the
8-virtual-device CPU mesh: same kernel code, same partitioner
interaction, executable without N chips.
"""

import jax
import numpy as np
import pytest

from __graft_entry__ import _make_scene
from mvtracker_tpu.models.mvtracker import MVTracker
from mvtracker_tpu.ops import corr as corr_ops
from mvtracker_tpu.ops import knn as knn_ops
from mvtracker_tpu.parallel import mesh as mesh_lib
from mvtracker_tpu.training import step as step_lib


def test_knn_interpret_matches_xla():
    rng = np.random.default_rng(0)
    ref = rng.normal(size=(3, 512, 3)).astype(np.float32)
    q = rng.normal(size=(3, 64, 3)).astype(np.float32)
    d_x, i_x = knn_ops.knn(ref, q, 8, backend="xla")
    d_p, i_p = knn_ops.knn(ref, q, 8, backend="pallas_interpret")
    # Distances agree to f32 rounding (the kernel's packed-key distance
    # math reassociates differently from the XLA path); indices exactly.
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(i_p), np.asarray(i_x))


def test_corr_interpret_matches_gather():
    rng = np.random.default_rng(1)
    cloud = rng.normal(size=(2, 256, 32)).astype(np.float32)
    xyz = rng.normal(size=(2, 256, 3)).astype(np.float32)
    tgt = rng.normal(size=(2, 16, 32)).astype(np.float32)
    coords = rng.normal(size=(2, 16, 3)).astype(np.float32)
    idx = rng.integers(0, 256, size=(2, 16, 4)).astype(np.int32)
    ref_out = corr_ops.corr_sample(xyz, cloud, tgt, coords, idx, backend="xla")
    p_out = corr_ops.corr_sample(
        xyz, cloud, tgt, coords, idx, backend="pallas_interpret"
    )
    np.testing.assert_allclose(np.asarray(p_out), np.asarray(ref_out), atol=1e-4)


@pytest.mark.slow
def test_sharded_step_with_pallas_interpret_kernels():
    """The FULL sharded train step (DP + view/track sharding over the model
    axis) with the Pallas kNN + corr kernels in interpret mode must match
    the XLA-backend sharded step."""
    n_devices = 8
    devices = jax.devices()[:n_devices]
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2, devices=devices)

    kw = dict(
        sliding_window_len=4, stride=4, fmaps_dim=16, num_heads=2,
        hidden_size=32, space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    model_xla = MVTracker(knn_backend="xla", corr_backend="xla", **kw)
    model_pal = MVTracker(
        knn_backend="pallas_interpret", corr_backend="pallas_interpret", **kw
    )

    rng = np.random.default_rng(0)
    b = mesh.shape["data"]
    v, t, h, w, n = 2, 6, 16, 16, 8
    scenes = [_make_scene(rng, v, t, h, w, n) for _ in range(b)]
    batch = {
        "rgbs": np.stack([s[0] for s in scenes]),
        "depths": np.stack([s[1] for s in scenes]),
        "query_points": np.stack([s[2] for s in scenes]),
        "intrs": np.stack([s[3] for s in scenes]),
        "extrs": np.stack([s[4] for s in scenes]),
        "traj_gt": rng.normal(size=(b, t, n, 3)).astype(np.float32),
        "vis_gt": np.ones((b, t, n), np.float32),
        "valid": np.ones((b, t, n), np.float32),
    }
    optimizer = step_lib.make_optimizer(total_steps=100)
    example = {k: val[0] for k, val in batch.items()}
    state = step_lib.init_state(
        model_xla, optimizer, example, jax.random.PRNGKey(0), iters=2
    )

    with jax.set_mesh(mesh):
        batch_sh = mesh_lib.shard_batch_pytree(batch, mesh)
        out = {}
        for name, model in (("xla", model_xla), ("pallas", model_pal)):
            ts = step_lib.make_train_step(
                model, optimizer, iters=2, mesh=mesh,
                shard_views=True, shard_tracks=True,
            )
            new_state, metrics = ts(state, batch_sh)
            out[name] = (new_state, float(metrics["loss"]))

    loss_dev = abs(out["xla"][1] - out["pallas"][1])
    assert np.isfinite(out["pallas"][1])
    assert loss_dev < 1e-4, f"interpret-kernel sharded loss deviates {loss_dev:.2e}"
    param_dev = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree.leaves(out["xla"][0].params),
            jax.tree.leaves(out["pallas"][0].params),
        )
    )
    assert param_dev < 5e-4, f"param deviation {param_dev:.2e}"


def test_model_sharded_knn_matches_global():
    """MVTracker with knn_mesh set routes big-level correlation kNN through
    the distributed shard_map schedules (SURVEY §2.6 "shard V·H·W for
    kNN"); the full forward must match the replicated-cloud model."""
    import jax.numpy as jnp

    devices = jax.devices()[:8]
    mesh = mesh_lib.make_mesh(n_data=2, n_model=4, devices=devices)
    rng = np.random.default_rng(3)
    kw = dict(
        sliding_window_len=4, stride=4, fmaps_dim=16, num_heads=2,
        hidden_size=32, space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    # 2 views x 32x48 at stride 4 -> level-0 cloud = 2*8*12 = 192 points;
    # threshold 64 so BOTH levels take the sharded path (level-1 = 48 pts
    # stays local: also covers the mixed local/sharded case).
    m_global = MVTracker(**kw)
    m_shard = MVTracker(**kw, knn_mesh=mesh, knn_shard_min_points=64)
    args = _make_scene(rng, 2, 6, 32, 48, 8)
    args = tuple(jnp.asarray(a) for a in args)
    params = m_global.init(jax.random.PRNGKey(0), *args, iters=1)
    out_g = jax.jit(lambda p: m_global.apply(p, *args, iters=1))(params)
    with jax.set_mesh(mesh):
        out_s = jax.jit(lambda p: m_shard.apply(p, *args, iters=1))(params)
    np.testing.assert_allclose(
        np.asarray(out_s["traj"]), np.asarray(out_g["traj"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out_s["vis"]), np.asarray(out_g["vis"]), atol=1e-5
    )


def test_knn_sharded_ring_schedule_in_model():
    """Force the ring schedule (M*k > N/D regime) through the model path."""
    import dataclasses

    import jax.numpy as jnp

    devices = jax.devices()[:8]
    mesh = mesh_lib.make_mesh(n_data=1, n_model=8, devices=devices)
    rng = np.random.default_rng(4)
    kw = dict(
        sliding_window_len=4, stride=4, fmaps_dim=16, num_heads=2,
        hidden_size=32, space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=1, corr_neighbors=8,
    )
    # level-0 cloud = 2*8*12=192 pts, N/D = 24; M*k = 32*8 = 256 > 24 ->
    # ring. (Also exercises P % D != 0 padding: 192 % 8 == 0, use 2x12x12
    # -> 2*3*3... keep 192/8=24 exact and pad via min_points on a 7-axis?
    # Simpler: oddly-sized query count only.)
    m_global = MVTracker(**kw)
    m_shard = MVTracker(**kw, knn_mesh=mesh, knn_shard_min_points=64)
    args = _make_scene(rng, 2, 6, 32, 48, 32)
    args = tuple(jnp.asarray(a) for a in args)
    params = m_global.init(jax.random.PRNGKey(0), *args, iters=1)
    out_g = jax.jit(lambda p: m_global.apply(p, *args, iters=1))(params)
    with jax.set_mesh(mesh):
        out_s = jax.jit(lambda p: m_shard.apply(p, *args, iters=1))(params)
    np.testing.assert_allclose(
        np.asarray(out_s["traj"]), np.asarray(out_g["traj"]), atol=1e-5
    )
