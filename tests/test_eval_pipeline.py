"""End-to-end evaluation pipeline test: synthetic scene -> predictor ->
evaluator -> metrics. Also validates the CopyCat-style harness contract
(reference `copycat.py:5-39`: a trivial baseline must flow through the same
evaluator)."""

import os

import numpy as np
import pytest

from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.evaluation.evaluator import Evaluator
from mvtracker_tpu.models.copycat import CopyCatPredictor


@pytest.fixture(scope="module")
def tiny_dataset():
    return [
        synthetic.render_scene(seed=s, n_views=2, n_frames=6, height=32, width=32, n_tracks=12)
        for s in range(2)
    ]


def test_copycat_through_evaluator(tiny_dataset):
    ev = Evaluator("kubric-multiview")
    summary, per_seq = ev.evaluate_sequence(CopyCatPredictor(), tiny_dataset)
    assert summary["n_sequences"] == 2
    assert "all_any" in summary
    # CopyCat nails static points and misses dynamic ones.
    if "all_static" in summary and "all_dynamic" in summary:
        assert (
            summary["all_static"]["average_pts_within_thresh"]
            >= summary["all_dynamic"]["average_pts_within_thresh"]
        )


def test_real_predictor_through_evaluator(tiny_dataset):
    import jax

    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker

    model = MVTracker(
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
    sc = tiny_dataset[0]
    import jax.numpy as jnp

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(sc.video),
        jnp.asarray(sc.videodepth),
        jnp.asarray(sc.query_points_3d),
        jnp.asarray(sc.intrs),
        jnp.asarray(sc.extrs),
        iters=1,
    )
    predictor = EvaluationPredictor(
        model, params, interp_shape=None, grid_size=2, n_iters=1
    )
    ev = Evaluator("kubric-multiview")
    summary, per_seq = ev.evaluate_sequence(predictor, tiny_dataset[:1])
    assert summary["n_sequences"] == 1
    assert np.isfinite(summary["fps"])
    assert "all_any" in summary


def test_csv_json_outputs(tiny_dataset, tmp_path):
    ev = Evaluator("kubric-multiview")
    summary, per_seq = ev.evaluate_sequence(CopyCatPredictor(), tiny_dataset)
    ev.save_json(summary, str(tmp_path / "summary.json"))
    ev.save_csv(per_seq, str(tmp_path / "per_seq.csv"))
    assert (tmp_path / "summary.json").exists()
    assert (tmp_path / "per_seq.csv").read_text().count("\n") >= 3


def test_single_point_mode(tiny_dataset):
    """Single-point eval mode (reference `evaluation_predictor_3dpt.py:191-339`)
    must produce one trajectory per query via per-query local grids."""
    import jax
    import jax.numpy as jnp

    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker

    model = MVTracker(
        sliding_window_len=4, fmaps_dim=16, num_heads=2, hidden_size=32,
        space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    sc = tiny_dataset[0]
    args = (
        jnp.asarray(sc.video), jnp.asarray(sc.videodepth),
        jnp.asarray(sc.query_points_3d[:3]), jnp.asarray(sc.intrs), jnp.asarray(sc.extrs),
    )
    params = model.init(jax.random.PRNGKey(0), *args, iters=1)
    predictor = EvaluationPredictor(
        model, params, interp_shape=None, grid_size=0, n_iters=1,
        single_point=True, local_grid_size=2, local_extent=10,
    )
    out = predictor(*args)
    assert out["traj"].shape == (sc.video.shape[1], 3, 3)
    assert np.isfinite(np.asarray(out["traj"])).all()


def test_predictor_resize_path(tiny_dataset):
    """interp_shape resize + intrinsics rescale must keep support-grid
    unprojection consistent (reference `evaluation_predictor_3dpt.py:71-87`)."""
    import jax
    import jax.numpy as jnp

    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker

    model = MVTracker(
        sliding_window_len=4, fmaps_dim=16, num_heads=2, hidden_size=32,
        space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    sc = tiny_dataset[0]
    # init at the resized shape (48, 64)
    import numpy as np

    from mvtracker_tpu.evaluation.predictor import nearest_resize

    rgbs_r = nearest_resize(
        jnp.asarray(sc.video).transpose(0, 1, 4, 2, 3), 48, 64
    ).transpose(0, 1, 3, 4, 2)
    depths_r = nearest_resize(jnp.asarray(sc.videodepth), 48, 64)
    scale = jnp.asarray([[64 / 32, 0, 0], [0, 48 / 32, 0], [0, 0, 1]], jnp.float32)
    intrs_r = jnp.einsum("ij,VTjk->VTik", scale, jnp.asarray(sc.intrs))
    n_q = sc.query_points_3d.shape[0]
    n_support = 2 * 2 * 2  # grid 2x2 per view x 2 views
    queries_total = jnp.zeros((n_q + n_support, 4))
    params = model.init(
        jax.random.PRNGKey(0), rgbs_r, depths_r, queries_total,
        intrs_r, jnp.asarray(sc.extrs), iters=1,
    )
    predictor = EvaluationPredictor(
        model, params, interp_shape=(48, 64), grid_size=2, n_iters=1
    )
    out = predictor(
        jnp.asarray(sc.video), jnp.asarray(sc.videodepth),
        jnp.asarray(sc.query_points_3d), jnp.asarray(sc.intrs), jnp.asarray(sc.extrs),
    )
    assert out["traj"].shape == (sc.video.shape[1], n_q, 3)
    assert np.isfinite(np.asarray(out["traj"])).all()


def test_sharded_evaluation_merges(tiny_dataset):
    """Multi-host eval sharding: shard results merge to the full summary."""
    ev = Evaluator("kubric-multiview")
    _, full = ev.evaluate_sequence(CopyCatPredictor(), tiny_dataset)
    _, s0 = ev.evaluate_sequence(CopyCatPredictor(), tiny_dataset, shard=(0, 2))
    _, s1 = ev.evaluate_sequence(CopyCatPredictor(), tiny_dataset, shard=(1, 2))
    merged = ev.summarize(s0 + s1)
    reference = ev.summarize(full)
    assert merged["n_sequences"] == reference["n_sequences"]
    np.testing.assert_allclose(
        merged["all_any"]["ate_visible"], reference["all_any"]["ate_visible"], atol=1e-9
    )


def test_summarize_unions_groups_across_sequences():
    """A metric group absent from sequence 0 (e.g. no very-dynamic tracks
    there) must still appear in the summary."""
    from mvtracker_tpu.evaluation.evaluator import Evaluator

    per_seq = [
        {"all_any": {"ate": 1.0}, "fps": 1.0, "seq_name": "a"},
        {"all_any": {"ate": 3.0}, "all_dynamic": {"ate": 5.0}, "fps": 1.0, "seq_name": "b"},
    ]
    s = Evaluator.summarize(per_seq)
    assert s["all_any"]["ate"] == 2.0
    assert s["all_dynamic"]["ate"] == 5.0


def test_eval_fps_excludes_compile(tiny_dataset):
    """The first datapoint of each input shape runs once untimed (compile
    warmup) before the timed run."""
    from mvtracker_tpu.evaluation.evaluator import Evaluator

    calls = {"n": 0}

    class Counting(CopyCatPredictor):
        def __call__(self, *a, **k):
            calls["n"] += 1
            return super().__call__(*a, **k)

    ev = Evaluator("kubric-multiview")
    _, per_seq = ev.evaluate_sequence(Counting(), tiny_dataset)
    n_seq = len(per_seq)
    # Same shape throughout the tiny dataset: 1 warmup + n_seq timed calls.
    assert calls["n"] == n_seq + 1


def test_strided_query_mode_evaluates_pre_query_frames():
    """query_mode='strided' keeps pre-query ground truth (bidirectional
    TAP-Vid protocol); 'first' masks it."""
    import numpy as np

    from mvtracker_tpu.evaluation.metrics import evaluate_predictions

    t, n = 8, 4
    rng = np.random.default_rng(0)
    gt = rng.normal(size=(t, n, 3)).astype(np.float32)
    vis = np.ones((t, n), bool)
    query_t = np.full(n, 4.0)  # mid-video queries
    query = np.concatenate(
        [query_t[:, None], gt[4, np.arange(n)]], axis=1
    ).astype(np.float32)
    # Predictions perfect AFTER the query, garbage BEFORE it.
    pred = gt.copy()
    pred[:4] += 100.0
    occ = np.zeros((t, n), bool)

    r_first, _ = evaluate_predictions(
        gt, vis, pred, occ, query_points=query, query_mode="first",
        distance_thresholds=(0.5,), static_threshold=None,
        dynamic_threshold=None, very_dynamic_threshold=None,
    )
    r_strided, _ = evaluate_predictions(
        gt, vis, pred, occ, query_points=query, query_mode="strided",
        distance_thresholds=(0.5,), static_threshold=None,
        dynamic_threshold=None, very_dynamic_threshold=None,
    )
    assert r_first["all_any"]["pts_within_0.50"] == 100.0
    assert r_strided["all_any"]["pts_within_0.50"] < 100.0  # pre-query counted


def test_fused_predictor_matches_eager_pipeline(tiny_dataset):
    """The fused one-dispatch eval path (resize + support grids + forward +
    slice inside one jit) must match composing the eager building blocks —
    the round-3 bench regression fix must not change numerics."""
    import jax
    import jax.numpy as jnp

    from mvtracker_tpu.evaluation import predictor as pred_lib
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker

    model = MVTracker(
        sliding_window_len=4, fmaps_dim=16, num_heads=2, hidden_size=32,
        space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    sc = tiny_dataset[0]
    rgbs = jnp.asarray(sc.video)
    depths = jnp.asarray(sc.videodepth)
    queries = jnp.asarray(sc.query_points_3d)
    intrs = jnp.asarray(sc.intrs)
    extrs = jnp.asarray(sc.extrs)
    params = model.init(jax.random.PRNGKey(0), rgbs, depths, queries, intrs, extrs)

    interp = (40, 48)
    p = EvaluationPredictor(
        model, params, interp_shape=interp, grid_size=2, n_iters=2
    )
    out = p(rgbs, depths, queries, intrs, extrs)

    # Eager reference composition (the pre-fusion pipeline).
    h, w = interp
    h_raw, w_raw = rgbs.shape[2], rgbs.shape[3]
    rgbs_r = pred_lib.nearest_resize(
        rgbs.transpose(0, 1, 4, 2, 3), h, w
    ).transpose(0, 1, 3, 4, 2)
    depths_r = pred_lib.nearest_resize(depths, h, w)
    scale = jnp.asarray([[w / w_raw, 0, 0], [0, h / h_raw, 0], [0, 0, 1]], intrs.dtype)
    intrs_r = jnp.einsum("ij,VTjk->VTik", scale, intrs)
    support = pred_lib.build_support_grid_points(depths_r, intrs_r, extrs, 2, 1)
    q_all = jnp.concatenate([queries, support], axis=0)
    ref = model.apply(params, rgbs_r, depths_r, q_all, intrs_r, extrs, iters=2)
    n = queries.shape[0]
    np.testing.assert_allclose(
        np.asarray(out["traj"]), np.asarray(ref["traj"][:, :n]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["vis"]), np.asarray(ref["vis"][:, :n]), rtol=1e-5, atol=1e-5
    )


def test_reference_benchmark_runner(tmp_path):
    """scripts/eval_reference_benchmark.py end-to-end on a synthetic disk
    fixture in the reference's Kubric layout: name DSL -> strict checkpoint
    load -> Evaluator -> CSV/JSON (round-3 verdict #7 — real-benchmark
    validation must be a download away, not an engineering task)."""
    import argparse
    import sys

    import flax.serialization
    import jax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import eval_reference_benchmark as erb

    from tests.test_kubric_loader import write_kubric_scene
    from mvtracker_tpu.datasets import synthetic
    from mvtracker_tpu.presets import build_model

    # Benchmark root in the documented layout.
    root = tmp_path / "benchmarks"
    scene_dir = root / "kubric-multiview" / "scene_000"
    sc = synthetic.render_scene(
        seed=3, n_views=2, n_frames=6, height=32, width=32, n_tracks=8
    )
    write_kubric_scene(sc, str(scene_dir))

    # A matching checkpoint artifact (small preset).
    model = build_model("small")
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0),
            sc.video.astype(np.float32), sc.videodepth.astype(np.float32),
            sc.query_points_3d.astype(np.float32),
            sc.intrs.astype(np.float32), sc.extrs.astype(np.float32),
            iters=1,
        )
    )()
    ckpt = tmp_path / "w.msgpack"
    ckpt.write_bytes(
        flax.serialization.msgpack_serialize(jax.tree.map(np.asarray, params))
    )

    args = argparse.Namespace(
        dataset="kubric-multiview", dataset_root=str(root),
        checkpoint=str(ckpt), model_size="small", interp=[0, 0],
        iters=1, grid=2, visibility_threshold=0.5, vis_geom=False,
        vis_head_hidden=0, knn_reuse=False, metrics_2d=False,
        max_sequences=0, with_copycat=True,
        scratch_dir=str(tmp_path / "scratch"),
        out_json=str(tmp_path / "summary.json"),
        out_csv=str(tmp_path / "per_seq.csv"),
    )
    result = erb.run(args)
    assert "all_any" in result["summary"]
    assert "copycat" in result
    assert (tmp_path / "summary.json").exists()
    assert (tmp_path / "per_seq.csv").exists()
    table = erb.format_table(result)
    assert "Average Jaccard" in table

    # Strict load must reject a mismatched model size.
    import pytest

    args.model_size = "medium"
    with pytest.raises(ValueError, match="strict warm-start"):
        erb.run(args)
