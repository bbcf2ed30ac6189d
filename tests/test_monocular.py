"""MonocularToMultiViewAdapter tests (reference contract:
`monocular_baselines.py:604-882`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.models.monocular import (
    MonocularToMultiViewAdapter,
    SimpleNNTracker2D,
    pick_best_view,
)


@pytest.fixture(scope="module")
def scene():
    return synthetic.render_scene(
        seed=5, n_views=3, n_frames=5, height=48, width=64, n_tracks=10
    )


def test_pick_best_view_prefers_visible(scene):
    view_idx, pix = pick_best_view(
        jnp.asarray(scene.query_points_3d),
        jnp.asarray(scene.videodepth),
        jnp.asarray(scene.intrs),
        jnp.asarray(scene.extrs),
    )
    view_idx = np.asarray(view_idx)
    n = scene.query_points_3d.shape[0]
    assert view_idx.shape == (n,)
    # Chosen views should mostly be ones where the query is actually visible
    # at its query frame.
    qt = scene.query_points_3d[:, 0].astype(int)
    hits = 0
    total = 0
    for i in range(n):
        if scene.visibility[:, qt[i], i].any():
            total += 1
            if scene.visibility[view_idx[i], qt[i], i]:
                hits += 1
    assert total > 0 and hits / total > 0.6


def test_adapter_static_scene_perfect_depth():
    """On a static scene (no motion), the identity 2D tracker + exact depth
    must reproduce query positions in world space."""
    scene = synthetic.render_scene(
        seed=7, n_views=2, n_frames=4, height=48, width=64, n_tracks=8,
        static_fraction=1.0, n_objects=3,
    )

    def identity_tracker(rgbs, queries):
        t = rgbs.shape[0]
        m = queries.shape[0]
        tracks = jnp.broadcast_to(queries[None, :, 1:], (t, m, 2))
        return tracks, jnp.ones((t, m))

    adapter = MonocularToMultiViewAdapter(identity_tracker)
    out = adapter(
        jnp.asarray(scene.video),
        jnp.asarray(scene.videodepth),
        jnp.asarray(scene.query_points_3d),
        jnp.asarray(scene.intrs),
        jnp.asarray(scene.extrs),
    )
    traj = np.asarray(out["traj"])
    gt = scene.trajectory_3d
    vis_any = scene.visibility.any(axis=0)
    err = np.linalg.norm(traj - gt, axis=-1)[vis_any]
    assert np.median(err) < 0.1, np.median(err)


@pytest.mark.slow
def test_simple_nn_tracker_runs(scene):
    tracker = SimpleNNTracker2D(patch=5, search=4)
    queries = np.asarray([[0.0, 30.0, 20.0], [1.0, 40.0, 25.0]], np.float32)
    tracks, vis = tracker(scene.video[0], queries)
    assert tracks.shape == (5, 2, 2)
    assert vis.shape == (5, 2)


def test_model_zoo_monocular_dispatch():
    """Every reference model-zoo monocular baseline name resolves to the
    adapter (reference `configs/model/*.yaml` group)."""
    import dataclasses

    from mvtracker_tpu.config import ModelConfig, build_model
    from mvtracker_tpu.models.monocular import MonocularToMultiViewAdapter

    for name in ("cotracker3_offline", "cotracker2_online", "locotrack",
                 "scenetracker", "delta", "spatialtrackerv2", "tapip3d",
                 "spatracker_monocular"):
        m = build_model(dataclasses.replace(ModelConfig(), name=name))
        assert isinstance(m, MonocularToMultiViewAdapter)
        assert m.jit_compatible is False


def test_config_new_model_fields_flow_through():
    """The newer model knobs are settable via dotted overrides, and
    None-valued fields keep each family's own default."""
    from mvtracker_tpu.config import build_model, load_config

    cfg = load_config(
        None,
        [
            "model.corr_knn_reuse=true",
            "model.corr_filter_invalid_depth=true",
            "model.support_memory_tokens=16",
            "model.compute_dtype=bfloat16",
            "model.transformer_scan_unroll=1",
        ],
    )
    m = build_model(cfg.model)
    assert m.corr_knn_reuse and m.corr_filter_invalid_depth
    assert m.support_memory_tokens == 16
    assert m.compute_dtype == "bfloat16"
    assert m.transformer_scan_unroll == 1

    spat = build_model(load_config(None, ["model.name=spatracker_multiview"]).model)
    assert spat.support_memory_tokens == 100  # family default preserved
    mvt = build_model(load_config(None, []).model)
    assert mvt.support_memory_tokens == 0
