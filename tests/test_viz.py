"""MP4 visualizer tests."""

import os

import numpy as np
import pytest

from mvtracker_tpu.viz.mp4 import (
    rainbow_colors,
    render_multiview_mosaic,
    render_tracks_on_video,
    save_video,
)


def test_rainbow_colors_shape():
    c = rainbow_colors(7)
    assert c.shape == (7, 3) and c.dtype == np.uint8
    assert len(np.unique(c, axis=0)) == 7


def test_render_tracks_draws_pixels(rng):
    t, h, w, n = 3, 32, 32, 2
    video = np.zeros((t, h, w, 3), np.uint8)
    traj = np.stack([
        np.linspace([5, 5], [20, 20], t),
        np.linspace([25, 10], [10, 25], t),
    ], axis=1)
    out = render_tracks_on_video(video, traj)
    assert out.shape == video.shape
    assert out.sum() > 0  # something was drawn
    # A disk exists at the first track's final position.
    assert out[-1, 20, 20].sum() > 0


def test_mosaic_tiles_views(rng):
    from mvtracker_tpu.datasets import synthetic

    sc = synthetic.render_scene(seed=2, n_views=2, n_frames=2, height=24, width=24, n_tracks=4)
    frames = render_multiview_mosaic(
        sc.video.astype(np.uint8), sc.trajectory_3d, sc.intrs, sc.extrs,
        visibility=sc.visibility.any(axis=0),
    )
    assert frames.shape == (2, 24, 48, 3)


def test_save_video_fallback(tmp_path, rng):
    frames = rng.integers(0, 255, size=(3, 16, 16, 3)).astype(np.uint8)
    out = save_video(frames, str(tmp_path / "clip.mp4"))
    import os

    assert os.path.exists(out)


def test_log_video_to_tensorboard(tmp_path):
    from torch.utils.tensorboard import SummaryWriter

    from mvtracker_tpu.viz.mp4 import log_video_to_tensorboard

    frames = np.zeros((3, 16, 16, 3), np.uint8)
    w = SummaryWriter(str(tmp_path))
    log_video_to_tensorboard(w, "eval/video", frames, step=1)
    w.close()
    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_mosaic_handles_behind_camera_points(rng):
    """Points at/behind the camera plane (z <= 0) must neither crash the
    renderer (NaN/inf projections) nor be drawn at mirrored positions."""
    from mvtracker_tpu.viz.mp4 import render_multiview_mosaic

    v, t, h, w, n = 1, 3, 32, 40, 2
    video = np.zeros((v, t, h, w, 3), np.uint8)
    intrs = np.tile(np.array([[40.0, 0, 20], [0, 40, 16], [0, 0, 1]]), (v, t, 1, 1))
    extrs = np.tile(np.eye(4)[:3], (v, t, 1, 1))  # camera at origin, +z fwd
    traj = np.zeros((t, n, 3), np.float32)
    traj[:, 0] = [0.0, 0.0, 2.0]  # in front: should draw
    traj[:, 1] = [0.1, 0.1, -2.0]  # behind: must not draw anywhere
    # No visibility given: culling must still apply.
    frames = render_multiview_mosaic(video, traj, intrs, extrs)
    assert frames.shape == (t, h, w, 3)
    drawn = (frames != 0).any(axis=-1)
    assert drawn.any()  # the in-front point was drawn
    # The behind point mirrors to pixel (18, 14)-ish; nothing may be drawn
    # outside the in-front point's neighborhood (center 20,16 radius<=4).
    yy, xx = np.nonzero(drawn.any(axis=0))
    assert np.all(np.abs(yy - 16) <= 5) and np.all(np.abs(xx - 20) <= 5), (
        list(zip(yy, xx))[:8]
    )


def test_mosaic_handles_nan_track(rng):
    from mvtracker_tpu.viz.mp4 import render_multiview_mosaic

    v, t, h, w, n = 1, 2, 16, 16, 1
    video = np.zeros((v, t, h, w, 3), np.uint8)
    intrs = np.tile(np.array([[16.0, 0, 8], [0, 16, 8], [0, 0, 1]]), (v, t, 1, 1))
    extrs = np.tile(np.eye(4)[:3], (v, t, 1, 1))
    traj = np.full((t, n, 3), np.nan, np.float32)
    frames = render_multiview_mosaic(video, traj, intrs, extrs)  # must not raise
    assert (frames == 0).all()
