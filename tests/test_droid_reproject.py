"""DROID visual-QA loop (droid/reproject.py): z-buffer point rendering
invariants, fused-cloud reprojection round trip, and the CLI subcommand."""

import json
import os

import numpy as np
import pytest

from mvtracker_tpu.droid.reproject import (
    fuse_frame_cloud,
    render_pointcloud_to_view,
    reproject_episode,
)
from tests.test_droid_dataset import processed_episode  # fixture  # noqa: F401


def simple_camera(h=48, w=64, f=60.0):
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], np.float64)
    extr = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)  # cam at origin
    return k, extr


def test_render_zbuffer_keeps_closest():
    """Two points projecting to the same pixel: the closer one must win."""
    k, extr = simple_camera()
    pts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]])
    cols = np.array([[255, 0, 0], [0, 255, 0]], np.float64)
    rgb, dep = render_pointcloud_to_view(pts, cols, k, extr, 48, 64, splat_size=0)
    assert tuple(rgb[24, 32]) == (0, 255, 0)
    np.testing.assert_allclose(dep[24, 32], 1.0)


def test_render_own_view_roundtrip():
    """Unproject one view's depth, render it back into the SAME view: the
    rendered depth must match the source depth where points land (the
    reference validation's core coherence check)."""
    rng = np.random.default_rng(0)
    h, w = 48, 64
    k, extr = simple_camera(h, w)
    depth = rng.uniform(0.5, 1.5, size=(h, w)).astype(np.float32)
    rgb = rng.integers(0, 255, size=(h, w, 3)).astype(np.float64)
    pts, cols = fuse_frame_cloud(
        rgb[None], depth[None], k[None], extr[None], [(0.1, 3.0)], stride=1
    )
    assert len(pts) == h * w
    r, d = render_pointcloud_to_view(pts, cols, k, extr, h, w, splat_size=0)
    hit = d > 0
    assert hit.mean() > 0.95
    # Anywhere a point landed, depth must be <= the true pixel depth (a
    # closer neighbor may project there); the median must match closely.
    err = np.abs(d[hit] - depth[hit])
    assert np.median(err) < 0.02, np.median(err)


def test_fuse_respects_clamps():
    rng = np.random.default_rng(1)
    h, w = 24, 24
    k, extr = simple_camera(h, w)
    depth = np.full((h, w), 5.0, np.float32)  # beyond the clamp
    depth[:4] = 1.0
    rgb = rng.uniform(0, 255, size=(h, w, 3))
    pts, _ = fuse_frame_cloud(
        rgb[None], depth[None], k[None], extr[None], [(0.1, 1.5)], stride=1
    )
    assert len(pts) == 4 * w  # only the clamp-passing rows survive


def test_reproject_episode_outputs(processed_episode):  # noqa: F811
    out_dir, _ = processed_episode
    dst = os.path.join(out_dir, "reproject_out")
    res = reproject_episode(
        out_dir, dst, max_frames=3, stride=4, overlay_tracks=True
    )
    assert res, "no cameras reprojected"
    for cam, entry in res.items():
        assert os.path.exists(entry["rgb"]), entry
        assert os.path.exists(entry["depth"]), entry
        assert os.path.exists(entry["validation"]), entry
    # Reprojected FFV1 depth decodes to the rendered resolution.
    from mvtracker_tpu.droid.depth_video import read_depth_video

    cam0 = sorted(res)[0]
    dec = read_depth_video(res[cam0]["depth"])
    assert dec.shape[0] == 3 and dec.ndim == 3
    assert (dec >= 0).all()


def test_reproject_cli(processed_episode):  # noqa: F811
    from mvtracker_tpu.cli.droid import main

    out_dir, _ = processed_episode
    dst = os.path.join(out_dir, "reproject_cli_out")
    main([
        "reproject", "--episode", out_dir, "--out", dst,
        "--max_frames", "2", "--stride", "4", "--no_depth_video",
    ])
    assert any(f.endswith("_reprojected.mp4") or f.endswith(".gif") or f.endswith(".npz")
               for f in os.listdir(dst))
