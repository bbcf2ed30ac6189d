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
