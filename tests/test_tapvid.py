"""TAP-Vid adapter tests with a synthetic pickle."""

import pickle

import numpy as np
import pytest

from mvtracker_tpu.datasets.tapvid import (
    TapVidDataset,
    sample_queries_first,
    sample_queries_strided,
)


def make_tapvid_pickle(tmp_path, t=6, h=24, w=32, n=5):
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, size=(t, h, w, 3)).astype(np.uint8)
    points = rng.uniform(0.1, 0.9, size=(n, t, 2)).astype(np.float32)
    occluded = rng.uniform(size=(n, t)) < 0.3
    occluded[:, 0] = False  # everyone visible at t=0
    data = {"seq_a": {"video": video, "points": points, "occluded": occluded}}
    p = tmp_path / "tapvid.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    return str(p), video, points, occluded


def test_sample_queries_first():
    occ = np.asarray([[True, False, False], [False, False, True]])
    pts = np.arange(12, dtype=np.float32).reshape(2, 3, 2)
    frames = np.zeros((3, 4, 4, 3), np.float32)
    out = sample_queries_first(occ, pts, frames)
    q = out["query_points"][0]
    # Track 0 first visible at t=1 -> query [1, x@t1, y@t1].
    np.testing.assert_allclose(q[0], [1, pts[0, 1, 0], pts[0, 1, 1]])
    np.testing.assert_allclose(q[1], [0, pts[1, 0, 0], pts[1, 0, 1]])


def test_sample_queries_strided():
    occ = np.zeros((2, 6), bool)
    pts = np.random.default_rng(0).normal(size=(2, 6, 2)).astype(np.float32)
    frames = np.zeros((6, 4, 4, 3), np.float32)
    out = sample_queries_strided(occ, pts, frames, query_stride=5)
    # 2 tracks x 2 strided frames (0, 5) = 4 queries.
    assert out["query_points"].shape == (1, 4, 3)


def test_dataset_roundtrip(tmp_path):
    p, video, points, occluded = make_tapvid_pickle(tmp_path)
    ds = TapVidDataset(p, query_mode="first")
    assert len(ds) == 1
    dp = ds[0]
    t, h, w = 6, 24, 32
    assert dp.video.shape == (1, t, h, w, 3)
    n = dp.query_points_3d.shape[0]
    assert dp.trajectory_3d.shape == (t, n, 3)
    # With unit depth and K=I, the 2D pixel tracks equal traj3d[..., :2].
    np.testing.assert_allclose(
        dp.trajectory_3d[..., :2], dp.trajectory[0, :, :, :2], atol=1e-4
    )
    # Queries visible at their query frame.
    qt = dp.query_points_3d[:, 0].astype(int)
    vis = dp.visibility[0]
    assert all(vis[qt[i], i] for i in range(n))
