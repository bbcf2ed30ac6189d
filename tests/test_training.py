"""Training loop tests: overfit smoke (the reference's convergence test
strategy — `configs/experiment/mvtracker_overfit*.yaml`), checkpoint
auto-resume, and the adaptive-iteration schedule."""

import numpy as np
import pytest

from mvtracker_tpu.datasets.loader import PrefetchLoader, SyntheticSceneDataset
from mvtracker_tpu.models.mvtracker import MVTracker
from mvtracker_tpu.training.train import TrainConfig, Trainer, augment_train_iters


def tiny_model():
    return MVTracker(
        sliding_window_len=4,
        fmaps_dim=16,
        num_heads=2,
        hidden_size=32,
        space_depth=1,
        time_depth=1,
        num_virtual_tracks=4,
        corr_n_levels=2,
        corr_neighbors=4,
    )


def tiny_loader(batch_size=1):
    ds = SyntheticSceneDataset(
        n_scenes=2, cache=True, n_views=2, n_frames=6, height=32, width=32, n_tracks=8
    )
    return PrefetchLoader(ds, batch_size=batch_size, num_workers=1, shuffle=False)


def test_augment_train_iters_distribution():
    cfg = TrainConfig(warmup_steps=10, train_iters=4)
    rng = np.random.default_rng(0)
    assert augment_train_iters(5, cfg, rng) == 1  # warmup
    vals = [augment_train_iters(100, cfg, rng) for _ in range(300)]
    assert set(vals) <= {1, 2, 3, 4}
    assert np.mean(np.asarray(vals) == 4) > 0.5  # mostly full iters


@pytest.mark.slow
def test_overfit_loss_decreases(tmp_path):
    cfg = TrainConfig(
        total_steps=30,
        lr=3e-4,
        warmup_steps=0,
        adaptive_iters=False,
        train_iters=1,
        save_ckpt_freq=1000,
        eval_freq=10_000,
        telemetry_freq=10,
        exp_dir=str(tmp_path / "exp"),
        schedule="const",
    )
    trainer = Trainer(tiny_model(), cfg)
    it = iter(tiny_loader())

    losses = []
    orig_get = trainer._get_step_fn

    def wrapped(iters):
        fn = orig_get(iters)

        def stepper(state, batch):
            state, metrics = fn(state, batch)
            losses.append(float(metrics["loss"]))
            return state, metrics

        return stepper

    trainer._get_step_fn = wrapped
    trainer.fit(it, max_steps=30)
    first = np.mean(losses[:5])
    last = np.mean(losses[-5:])
    assert last < first, f"loss did not decrease: {first} -> {last}"


@pytest.mark.slow
def test_checkpoint_resume(tmp_path):
    cfg = TrainConfig(
        total_steps=10,
        warmup_steps=0,
        adaptive_iters=False,
        train_iters=1,
        save_ckpt_freq=5,
        telemetry_freq=100,
        exp_dir=str(tmp_path / "exp"),
        schedule="const",
    )
    model = tiny_model()
    t1 = Trainer(model, cfg)
    state = t1.fit(iter(tiny_loader()), max_steps=6)
    assert int(state.step) == 6

    # A fresh trainer must resume from the step-5 checkpoint.
    t2 = Trainer(model, cfg)
    state2 = t2.fit(iter(tiny_loader()), max_steps=8)
    assert int(state2.step) == 8
    latest = t2._ckpt_manager().latest_step()
    assert latest is not None and latest >= 5


def test_loader_statefulness():
    loader = tiny_loader()
    it = iter(loader)
    next(it)
    state = loader.state_dict()
    b_expected = next(it)

    loader2 = tiny_loader()
    loader2.load_state_dict(state)
    b_actual = next(iter(loader2))
    np.testing.assert_allclose(b_actual["rgbs"], b_expected["rgbs"])


def test_crash_forensics(tmp_path):
    """On a training exception, the offending batch is dumped to disk
    (reference `cli/train.py:741-766`)."""
    cfg = TrainConfig(
        total_steps=5, warmup_steps=0, adaptive_iters=False, train_iters=1,
        save_ckpt_freq=1000, telemetry_freq=100,
        exp_dir=str(tmp_path / "exp"), schedule="const",
    )
    trainer = Trainer(tiny_model(), cfg)

    class Boom(Exception):
        pass

    def bad_step_factory(iters):
        def stepper(state, batch):
            raise Boom("injected failure")
        return stepper

    trainer._get_step_fn = bad_step_factory
    with pytest.raises(Boom):
        trainer.fit(iter(tiny_loader()), max_steps=5)
    crash_dir = tmp_path / "exp" / "crash"
    dumps = list(crash_dir.glob("batch_step*.npz"))
    assert dumps, "crash batch dump missing"
    data = np.load(dumps[0])
    assert "rgbs" in data


def test_optimizer_tiny_schedule_no_nan():
    """Regression: onecycle with tiny total_steps used to yield a zero-width
    warmup segment -> NaN learning rate -> NaN params."""
    import jax.numpy as jnp
    import optax

    from mvtracker_tpu.training import step as step_lib

    for total in (2, 5, 12):
        opt = step_lib.make_optimizer(total_steps=total, schedule="cos")
        p = {"w": jnp.ones(4)}
        st = opt.init(p)
        g = {"w": jnp.full(4, 0.1)}
        for _ in range(3):
            u, st = opt.update(g, st, p)
            assert np.isfinite(np.asarray(u["w"])).all()
            p = optax.apply_updates(p, u)


def test_crash_replay(tmp_path):
    """Dumped crash batches reload and replay through the loss."""
    import jax

    from mvtracker_tpu.training import replay as replay_lib
    from mvtracker_tpu.training import step as step_lib

    cfg = TrainConfig(
        total_steps=3, warmup_steps=0, adaptive_iters=False, train_iters=1,
        save_ckpt_freq=1000, telemetry_freq=100,
        exp_dir=str(tmp_path / "exp"), schedule="const",
    )
    model = tiny_model()
    trainer = Trainer(model, cfg)

    real_factory = trainer._get_step_fn

    calls = {"n": 0}

    def bad_after_one(iters):
        real = real_factory(iters)

        def stepper(state, batch):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise RuntimeError("boom")
            return real(state, batch)

        return stepper

    trainer._get_step_fn = bad_after_one
    with pytest.raises(RuntimeError):
        trainer.fit(iter(tiny_loader()), max_steps=3)

    batch = replay_lib.load_crash_batch(str(tmp_path / "exp" / "crash"))
    assert "rgbs" in batch

    opt = step_lib.make_optimizer(total_steps=10)
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    state = step_lib.init_state(model, opt, example, jax.random.PRNGKey(0), iters=1)
    report = replay_lib.replay(batch, model, state.params, iters=1)
    assert np.isfinite(report["loss"])
    assert report["nonfinite_grad_leaves"] == []


def test_prefetching_iter_yields_batches():
    loader = tiny_loader()
    it = loader.prefetching_iter()
    b1 = next(it)
    b2 = next(it)
    assert b1["rgbs"].shape == b2["rgbs"].shape
    assert not np.allclose(b1["query_points"], b2["query_points"])


def test_profiler_trace_window(tmp_path):
    """ProfilerTraceWindow captures a jax.profiler trace over a step range
    (SURVEY §5: the TPU-native upgrade over the reference's manual-only
    phase timing)."""
    import os

    cfg = TrainConfig(
        total_steps=4,
        warmup_steps=0,
        adaptive_iters=False,
        train_iters=1,
        save_ckpt_freq=1000,
        eval_freq=10_000,
        telemetry_freq=100,
        exp_dir=str(tmp_path / "exp"),
        schedule="const",
        profile_start_step=1,
        profile_n_steps=2,
    )
    trainer = Trainer(tiny_model(), cfg)
    trainer.fit(iter(tiny_loader()), max_steps=4)

    profile_dir = tmp_path / "exp" / "profile"
    assert profile_dir.is_dir()
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(profile_dir)
        for f in fs
        if f.endswith((".xplane.pb", ".trace.json.gz", ".json.gz"))
    ]
    assert files, f"no trace artifacts under {profile_dir}"


def test_warm_start_strict_and_nonstrict(tmp_path):
    """Warm-start loads msgpack weights; mismatched trees fall back to
    non-strict merging of intersecting leaves (reference train.py:603-620)."""
    import flax.serialization
    import flax.traverse_util as tru
    import jax

    from mvtracker_tpu.training import step as step_lib

    model = tiny_model()
    batch = next(iter(tiny_loader()))
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    trainer = Trainer(model, TrainConfig(exp_dir=str(tmp_path / "a")))
    opt = trainer.optimizer
    s1 = step_lib.init_state(model, opt, example, jax.random.PRNGKey(0), iters=1)
    s2 = step_lib.init_state(model, opt, example, jax.random.PRNGKey(7), iters=1)

    path = tmp_path / "w.msgpack"
    path.write_bytes(flax.serialization.to_bytes(s1.params))

    # Strict: identical tree -> every leaf equals the saved value.
    s2w = trainer.warm_start(s2, str(path))
    for k, v in tru.flatten_dict(s2w.params, sep="/").items():
        np.testing.assert_array_equal(
            np.asarray(v), np.asarray(tru.flatten_dict(s1.params, sep="/")[k]), k
        )

    # Non-strict: a wider model loads what intersects and keeps the rest.
    wide = MVTracker(
        sliding_window_len=4, fmaps_dim=16, num_heads=2, hidden_size=64,
        space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    trainer_w = Trainer(wide, TrainConfig(exp_dir=str(tmp_path / "b")))
    sw = step_lib.init_state(wide, trainer_w.optimizer, example, jax.random.PRNGKey(1), iters=1)
    sww = trainer_w.warm_start(sw, str(path))  # must not raise
    flat_before = tru.flatten_dict(sw.params, sep="/")
    flat_after = tru.flatten_dict(sww.params, sep="/")
    fnet_key = [k for k in flat_after if k.startswith("params/fnet/conv1")][0]
    np.testing.assert_array_equal(
        np.asarray(flat_after[fnet_key]),
        np.asarray(tru.flatten_dict(s1.params, sep="/")[fnet_key]),
    )
    assert any(
        np.asarray(flat_after[k]).shape != np.asarray(tru.flatten_dict(s1.params, sep="/").get(k, flat_after[k])).shape
        or np.array_equal(np.asarray(flat_after[k]), np.asarray(flat_before[k]))
        for k in flat_after
    )


def test_warm_start_from_bf16_msgpack(tmp_path):
    """Release artifacts are exported as bf16 msgpack to halve size
    (scripts/export_params_msgpack.py --dtype bfloat16); warm_start must
    load them back into the f32 train state, losing only bf16 rounding."""
    import flax.serialization
    import flax.traverse_util as tru
    import jax
    import jax.numpy as jnp

    from mvtracker_tpu.training import step as step_lib

    model = tiny_model()
    batch = next(iter(tiny_loader()))
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    trainer = Trainer(model, TrainConfig(exp_dir=str(tmp_path / "a")))
    s1 = step_lib.init_state(model, trainer.optimizer, example, jax.random.PRNGKey(0), iters=1)
    s2 = step_lib.init_state(model, trainer.optimizer, example, jax.random.PRNGKey(7), iters=1)

    bf16 = jax.tree.map(
        lambda x: np.asarray(x).astype(jnp.bfloat16)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else np.asarray(x),
        s1.params,
    )
    path = tmp_path / "w_bf16.msgpack"
    path.write_bytes(flax.serialization.msgpack_serialize(bf16))

    s2w = trainer.warm_start(s2, str(path))
    ref = tru.flatten_dict(s1.params, sep="/")
    for k, v in tru.flatten_dict(s2w.params, sep="/").items():
        v = np.asarray(v)
        assert v.dtype == np.asarray(ref[k]).dtype, k  # restored to train dtype
        np.testing.assert_allclose(v, np.asarray(ref[k], np.float32),
                                   rtol=8e-3, atol=8e-3, err_msg=k)


def test_warm_start_migrates_prescan_layout(tmp_path):
    """msgpack checkpoints from before the updateformer scan refactor
    (unrolled time_i/sv2p_i/svirt_i/sp2v_i names) are stacked into the
    scanned 'layers' layout on load — every transformer leaf transfers."""
    import flax.serialization
    import flax.traverse_util as tru
    import jax

    from mvtracker_tpu.training import step as step_lib

    model = tiny_model()  # space_depth == time_depth == 1 -> scanned layout
    batch = next(iter(tiny_loader()))
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    trainer = Trainer(model, TrainConfig(exp_dir=str(tmp_path)))
    s = step_lib.init_state(model, trainer.optimizer, example, jax.random.PRNGKey(3), iters=1)

    # Rewrite the params into the PRE-refactor layout (unstack layers).
    flat = tru.flatten_dict(jax.tree.map(np.asarray, s.params), sep="/")
    old = {}
    names = {"time": "time", "sv2p": "sv2p", "svirt": "svirt", "sp2v": "sp2v"}
    for k, v in flat.items():
        if "/updateformer/layers/" in k:
            head, rest = k.split("/updateformer/layers/", 1)
            block, tail = rest.split("/", 1)
            for i in range(v.shape[0]):
                old[f"{head}/updateformer/{names[block]}_{i}/{tail}"] = v[i]
        else:
            old[k] = v
    old_tree = tru.unflatten_dict(old, sep="/")
    path = tmp_path / "old.msgpack"
    path.write_bytes(flax.serialization.to_bytes(old_tree))

    s2 = step_lib.init_state(model, trainer.optimizer, example, jax.random.PRNGKey(9), iters=1)
    s2w = trainer.warm_start(s2, str(path))
    got = tru.flatten_dict(s2w.params, sep="/")
    want = tru.flatten_dict(s.params, sep="/")
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]), k)


def test_loader_process_striping():
    """Multi-host data partition: per-process loaders take disjoint strides
    of the SAME seeded permutation; the union is the full epoch."""
    ds = SyntheticSceneDataset(
        n_scenes=8, cache=True, n_views=2, n_frames=4, height=32, width=32, n_tracks=4
    )
    orders = []
    for pi in range(2):
        loader = PrefetchLoader(
            ds, batch_size=1, shuffle=True, seed=5,
            process_index=pi, process_count=2,
        )
        orders.append(loader._order(epoch=0))
    all_idx = np.concatenate(orders)
    assert len(set(orders[0]) & set(orders[1])) == 0
    assert sorted(all_idx.tolist()) == list(range(8))
    # Same permutation base: single-host order interleaves the two strides.
    full = PrefetchLoader(ds, batch_size=1, shuffle=True, seed=5)._order(0)
    np.testing.assert_array_equal(full[0::2], orders[0])
    np.testing.assert_array_equal(full[1::2], orders[1])


def test_shard_batch_global_assembly_matches_device_put():
    """The multi-host batch-assembly primitive
    (jax.make_array_from_process_local_data) produces the same global array
    as device_put on a single process — the path multi-host feeding relies
    on (`parallel.mesh.shard_batch_pytree`)."""
    import jax

    from mvtracker_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh()
    sh = mesh_lib.batch_sharding(mesh)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    a = jax.device_put(x, sh)
    b = jax.make_array_from_process_local_data(sh, x, x.shape)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert b.sharding == sh


def test_prefetching_iter_abandonment_unblocks_producer():
    """Abandoning the iterator mid-stream must not leave the producer thread
    blocked forever on a full queue (leaked thread + pinned batches)."""
    import threading
    import time

    loader = tiny_loader()
    loader.prefetch = 1
    # Warm the dataset cache so batches are instant and the producer
    # reliably reaches the BLOCKING q.put (the deadlock-prone state).
    for i in range(len(loader.dataset)):
        _ = loader.dataset[i]
    it = loader.prefetching_iter()
    next(it)  # producer running, queue fills
    time.sleep(1.0)  # let the producer block in q.put on the full queue
    before = threading.active_count()
    it.close()  # abandon: generator finally sets the stop event
    deadline = time.time() + 10
    while threading.active_count() > before - 1 and time.time() < deadline:
        time.sleep(0.1)
    # The producer must have exited (active_count back below the in-stream
    # level). A blocking q.put would keep it alive past the deadline.
    assert threading.active_count() <= before - 1


def test_sharded_train_step_matches_single_device():
    """SPMD correctness, not just 'it runs': loss, grad norm, and the
    updated parameters of the fully sharded train step (data axis + view
    sharding + track sharding on a 4x2 mesh) must match the single-device
    step within fp32 tolerance. The reference's contract is DDP's exact
    gradient all-reduce (`cli/train.py:358-365,787`); here XLA's SPMD
    partitioner must preserve the same semantics."""
    import jax

    from mvtracker_tpu.parallel import mesh as mesh_lib
    from mvtracker_tpu.training import step as step_lib
    from __graft_entry__ import _make_scene

    model = MVTracker(
        sliding_window_len=4,
        stride=4,
        fmaps_dim=16,
        num_heads=2,
        hidden_size=32,
        space_depth=1,
        time_depth=1,
        num_virtual_tracks=4,
        corr_n_levels=2,
        corr_neighbors=4,
        # r3 visibility pathway under sharding too: the geom features
        # broadcast coords over the (sharded) view axis and gather from
        # sharded depth maps — the partitioner must preserve parity.
        vis_geom_features=True,
        vis_head_hidden=16,
    )
    rng = np.random.default_rng(7)
    b, v, t, h, w, n = 8, 2, 6, 16, 16, 8
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
    state = step_lib.init_state(model, optimizer, example, jax.random.PRNGKey(0), iters=2)

    # Single device (replicated baseline).
    step_ref = step_lib.make_train_step(model, optimizer, iters=2)
    s_ref, m_ref = step_ref(state, batch)

    # Fully sharded.
    mesh = mesh_lib.make_mesh(n_data=4, n_model=2)
    with jax.set_mesh(mesh):
        batch_sh = mesh_lib.shard_batch_pytree(batch, mesh)
        step_sh = step_lib.make_train_step(
            model, optimizer, iters=2, mesh=mesh, shard_views=True, shard_tracks=True
        )
        s_sh, m_sh = step_sh(state, batch_sh)

    np.testing.assert_allclose(
        float(m_sh["loss"]), float(m_ref["loss"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(m_sh["grad_norm"]), float(m_ref["grad_norm"]), rtol=1e-4, atol=1e-6
    )
    flat_ref = jax.tree_util.tree_leaves_with_path(s_ref.params)
    flat_sh = dict(jax.tree_util.tree_leaves_with_path(s_sh.params))
    worst = 0.0
    for path, leaf_ref in flat_ref:
        d = float(np.max(np.abs(np.asarray(flat_sh[path]) - np.asarray(leaf_ref))))
        worst = max(worst, d)
        assert d < 5e-5, f"param divergence {d:.2e} at {jax.tree_util.keystr(path)}"
    assert worst < 5e-5


def test_warm_start_migrates_corr_width(tmp_path):
    """A uniform-k checkpoint warm-starts a corr_neighbors_per_level model:
    old neighbor rows of the input projection land at their new positions,
    added ranks start at zero, and every other leaf transfers strictly."""
    import dataclasses

    import flax.serialization
    import flax.traverse_util as tru
    import jax

    from mvtracker_tpu.training import step as step_lib

    old_model = tiny_model()
    new_model = dataclasses.replace(old_model, corr_neighbors_per_level=(8, 4))
    batch = next(iter(tiny_loader()))
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}

    t_old = Trainer(old_model, TrainConfig(exp_dir=str(tmp_path / "a")))
    s_old = step_lib.init_state(
        old_model, t_old.optimizer, example, jax.random.PRNGKey(0), iters=1
    )
    path = tmp_path / "w.msgpack"
    path.write_bytes(
        flax.serialization.msgpack_serialize(
            jax.tree.map(np.asarray, s_old.params)
        )
    )

    t_new = Trainer(new_model, TrainConfig(exp_dir=str(tmp_path / "b")))
    s_new = step_lib.init_state(
        new_model, t_new.optimizer, example, jax.random.PRNGKey(7), iters=1
    )
    # strict: migration must make every leaf land (nothing skipped/missing).
    s_w = t_new.warm_start(s_new, str(path), strict=True)

    k_old = np.asarray(
        s_old.params["params"]["updateformer"]["input_transform"]["kernel"]
    )
    k_new = np.asarray(
        s_w.params["params"]["updateformer"]["input_transform"]["kernel"]
    )
    fe = (old_model.flow_embed_dim + 1) * 3
    f = old_model.corr_feat_width
    # flow-embed rows unchanged.
    np.testing.assert_array_equal(k_new[:fe], k_old[:fe])
    # level 0: old 4 ranks copied, ranks 4..7 zero.
    np.testing.assert_array_equal(k_new[fe : fe + 4 * f], k_old[fe : fe + 4 * f])
    assert (k_new[fe + 4 * f : fe + 8 * f] == 0).all()
    # level 1 + tail (ffeats/mask rows) shifted by the added 4*f rows.
    np.testing.assert_array_equal(k_new[fe + 8 * f :], k_old[fe + 4 * f :])

    # every non-input_transform leaf transferred verbatim.
    flat_old = tru.flatten_dict(s_old.params, sep="/")
    for k, v in tru.flatten_dict(s_w.params, sep="/").items():
        if "input_transform/kernel" in k:
            continue
        np.testing.assert_array_equal(np.asarray(v), np.asarray(flat_old[k]), err_msg=k)


def test_warm_start_strict_raises_on_mismatch(tmp_path):
    """strict=True must raise when the checkpoint does not match the model
    (round-3 advisor: eval paths silently reported metrics from
    partially-initialized params)."""
    import dataclasses

    import flax.serialization
    import jax
    import pytest

    from mvtracker_tpu.training import step as step_lib

    old_model = tiny_model()
    new_model = dataclasses.replace(old_model, fmaps_dim=32)
    batch = next(iter(tiny_loader()))
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    t_old = Trainer(old_model, TrainConfig(exp_dir=str(tmp_path / "a")))
    s_old = step_lib.init_state(
        old_model, t_old.optimizer, example, jax.random.PRNGKey(0), iters=1
    )
    path = tmp_path / "w.msgpack"
    path.write_bytes(
        flax.serialization.msgpack_serialize(jax.tree.map(np.asarray, s_old.params))
    )
    t_new = Trainer(new_model, TrainConfig(exp_dir=str(tmp_path / "b")))
    s_new = step_lib.init_state(
        new_model, t_new.optimizer, example, jax.random.PRNGKey(7), iters=1
    )
    with pytest.raises(ValueError, match="strict warm-start"):
        t_new.warm_start(s_new, str(path), strict=True)
