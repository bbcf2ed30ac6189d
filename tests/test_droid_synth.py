"""Synthetic DROID episodes (round-5 north-star harness) + world-scale adapter.

Covers `droid/synth_episode.build_episode` (raw synthesis -> REAL FK pipeline
-> ray-traced recordings, the layout `load_droid_episode` consumes; reference
GT contract: `conversions/droid/training_data/generate_tracks_and_metadata.py:
291-386`), `datasets/droid.scale_datapoint_world`, and `DroidTrainDataset`
(BASELINE config 4's metric->trained-scale bridge).
"""

import numpy as np
import pytest

from mvtracker_tpu.datasets.droid import (
    DroidEpisodeDataset,
    DroidTrainDataset,
    scale_datapoint_world,
)
from mvtracker_tpu.droid.synth_episode import build_episode


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("droid_synth"))
    build_episode(
        root, seed=0, n_frames=6, n_external_cams=2,
        width=64, height=48, num_track_points=4,
    )
    return root


def _project(dp, v, t):
    """Pixel projection of trajectory_3d through view v's (intrs, extrs)."""
    pts_h = np.concatenate(
        [dp.trajectory_3d[t], np.ones((dp.trajectory_3d.shape[1], 1))], -1
    )
    cam = pts_h @ dp.extrs[v, t].T  # [N, 3]
    pix = cam @ dp.intrs[v, t].T
    return pix[:, :2] / pix[:, 2:3], cam[:, 2]


def test_build_episode_layout_and_geometry(synth_root):
    ds = DroidEpisodeDataset(synth_root + "/processed")
    assert len(ds) == 1
    dp = ds[0]
    v, t, h, w, c = dp.video.shape
    assert (t, h, w, c) == (6, 48, 64, 3)
    assert v == 3  # 2 external + wrist
    assert dp.videodepth.shape == (v, t, h, w)
    assert np.isfinite(dp.trajectory_3d).all()
    # Metric scale: a tabletop scene, everything within a few meters.
    pos = dp.videodepth[dp.videodepth > 0]
    assert pos.size and 0.05 < np.median(pos) < 5.0
    # Per-view 2D tracks must be the projection of the 3D tracks wherever
    # the loader marked them visible.
    for vi in range(v):
        for ti in range(t):
            vis = dp.visibility[vi, ti]
            if not vis.any():
                continue
            pix, cam_z = _project(dp, vi, ti)
            np.testing.assert_allclose(
                dp.trajectory[vi, ti, vis, :2], pix[vis], atol=0.75
            )
            np.testing.assert_allclose(
                dp.trajectory[vi, ti, vis, 2], cam_z[vis], atol=1e-3
            )
    # The rendered depth must agree with track camera-z where the track
    # is visible (the renderer and the FK GT share the same world).
    vi, ti = 0, 0
    vis = dp.visibility[vi, ti]
    if vis.any():
        pix, cam_z = _project(dp, vi, ti)
        xi = np.clip(np.round(pix[vis, 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(pix[vis, 1]).astype(int), 0, h - 1)
        d = dp.videodepth[vi, ti, yi, xi]
        ok = d > 0
        assert ok.any()
        assert np.median(np.abs(d[ok] - cam_z[vis][ok])) < 0.05


def test_scale_datapoint_world_is_a_similarity(synth_root):
    dp = DroidEpisodeDataset(synth_root + "/processed")[0]
    s = 3.7
    sc = scale_datapoint_world(dp, s)
    # Image content untouched.
    np.testing.assert_array_equal(sc.video, dp.video)
    np.testing.assert_array_equal(sc.intrs, dp.intrs)
    np.testing.assert_allclose(sc.videodepth, dp.videodepth * s, rtol=1e-6)
    np.testing.assert_allclose(sc.trajectory_3d, dp.trajectory_3d * s, rtol=1e-6)
    np.testing.assert_allclose(sc.query_points_3d[:, 1:4],
                               dp.query_points_3d[:, 1:4] * s, rtol=1e-6)
    # Rotations untouched, translations scaled.
    np.testing.assert_array_equal(sc.extrs[..., :3], dp.extrs[..., :3])
    np.testing.assert_allclose(sc.extrs[..., 3], dp.extrs[..., 3] * s, rtol=1e-6)
    # Pixel projections identical, camera-z scaled: the defining property.
    for vi in range(dp.video.shape[0]):
        pix0, z0 = _project(dp, vi, 2)
        pix1, z1 = _project(sc, vi, 2)
        np.testing.assert_allclose(pix1, pix0, atol=1e-4)
        np.testing.assert_allclose(z1, z0 * s, rtol=1e-6)
    # trajectory carries (pixel xy, camera z): xy unchanged, z scaled.
    np.testing.assert_allclose(sc.trajectory[..., :2], dp.trajectory[..., :2])
    np.testing.assert_allclose(sc.trajectory[..., 2], dp.trajectory[..., 2] * s,
                               rtol=1e-6)


def test_droid_train_dataset_auto_scale(synth_root):
    ds = DroidTrainDataset(synth_root + "/processed", world_scale="auto",
                           target_median_depth=4.0)
    dp = ds[0]
    med = float(np.median(dp.videodepth[dp.videodepth > 0]))
    assert abs(med - 4.0) < 1e-3
    # Fixed-scale and off modes.
    dp2 = DroidTrainDataset(synth_root + "/processed", world_scale=2.0)[0]
    dp1 = DroidTrainDataset(synth_root + "/processed", world_scale=1.0)[0]
    np.testing.assert_allclose(dp2.videodepth, dp1.videodepth * 2.0, rtol=1e-6)
