"""DROID episode -> Datapoint -> tracker/trainer (BASELINE configs 3-4)."""

import json
import os

import numpy as np
import pytest

from mvtracker_tpu.datasets.droid import DroidEpisodeDataset, load_droid_episode
from mvtracker_tpu.droid import pipeline
from mvtracker_tpu.droid.depth_video import write_depth_video
from tests.test_droid import make_episode


@pytest.fixture(scope="module")
def processed_episode(tmp_path_factory):
    """Raw episode -> pipeline artifacts -> synthetic recordings."""
    tmp_path = tmp_path_factory.mktemp("droid_ds")
    ep = make_episode(tmp_path, t=10)
    out_dir = str(tmp_path / "processed" / "episode_000")
    pipeline.process_episode(ep, out_dir, num_track_points=8)

    # Synthetic recordings for the external camera: constant-ish depth +
    # noise rgb at the metadata resolution.
    rng = np.random.default_rng(0)
    h, w, t = 240, 320, 10
    cam_dir = os.path.join(out_dir, "recordings", "100")
    os.makedirs(cam_dir)
    rgb = rng.integers(0, 255, size=(t, h, w, 3), dtype=np.uint8)
    np.savez_compressed(os.path.join(cam_dir, "rgb.npz"), rgb=rgb)
    depth = rng.uniform(0.5, 2.0, size=(t, h, w)).astype(np.float32)
    write_depth_video(os.path.join(cam_dir, "depth.mkv"), depth)
    # metadata.json lives in the RAW episode; the dataset reads it from the
    # processed dir — copy it over (the pipeline CLI stages it the same way).
    with open(os.path.join(ep, "metadata.json")) as f:
        meta = json.load(f)
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return out_dir, depth


def test_load_droid_episode(processed_episode):
    out_dir, depth = processed_episode
    dp = load_droid_episode(out_dir)
    v, t, h, w, _ = dp.video.shape
    assert (v, t, h, w) == (1, 10, 240, 320)
    assert dp.videodepth.shape == (1, 10, 240, 320)
    # FFV1 depth round-trips to mm precision.
    np.testing.assert_allclose(dp.videodepth[0], np.floor(depth * 1000) / 1000, atol=1e-6)
    assert dp.intrs.shape == (1, 10, 3, 3)
    assert dp.extrs.shape == (1, 10, 3, 4)
    assert dp.trajectory_3d.shape == (10, 16, 3)
    assert dp.trajectory.shape == (1, 10, 16, 3)
    assert dp.query_points_3d.shape == (16, 4)
    assert (dp.query_points_3d[:, 0] == 0).all()

    # Geometry consistency: the stored per-view 2D tracks must equal the
    # projection of the 3D tracks through (intrs, extrs).
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    pix, z = geo.world_to_pixel_xy_and_camera_z(
        jnp.asarray(dp.trajectory_3d),
        jnp.asarray(dp.intrs[0]),
        jnp.asarray(dp.extrs[0]),
    )
    vis = dp.visibility[0]
    np.testing.assert_allclose(
        np.asarray(pix)[vis], dp.trajectory[0][..., :2][vis], atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(z)[..., 0][vis], dp.trajectory[0][..., 2][vis], atol=1e-3
    )


def test_droid_dataset_scan(processed_episode):
    out_dir, _ = processed_episode
    ds = DroidEpisodeDataset(os.path.dirname(out_dir), max_frames=6)
    assert len(ds) == 1
    dp = ds[0]
    assert dp.video.shape[1] == 6
    assert dp.trajectory_3d.shape[0] == 6


def test_droid_track_cli(processed_episode, tmp_path):
    """Full-episode tracking through the CLI (random init, tiny shapes)."""
    out_dir, _ = processed_episode
    out_npz = str(tmp_path / "pred.npz")
    from mvtracker_tpu.cli import droid as droid_cli

    droid_cli.main(
        [
            "track",
            "--episode", out_dir,
            "--out", out_npz,
            "--queries", "gripper",
            "--iters", "1",
            "--grid_size", "0",
            "--interp_shape", "128", "128",
            "--max_frames", "6",
            "--dtype", "float32",
        ]
    )
    with np.load(out_npz) as z:
        assert z["traj"].shape == (6, 16, 3)
        assert np.isfinite(z["traj"]).all()
        assert z["vis"].shape == (6, 16)


def test_droid_training_batch(processed_episode):
    """DROID Datapoints feed the trainer's collate + one train step."""
    import jax

    from mvtracker_tpu.datasets.datapoint import collate
    from mvtracker_tpu.models.mvtracker import MVTracker
    from mvtracker_tpu.training import step as step_lib

    out_dir, _ = processed_episode
    dp = load_droid_episode(out_dir, max_frames=6)
    batch = collate([dp])
    # Trainer consumes (rgbs, depths, query_points, traj_gt, vis_gt, valid).
    assert batch["rgbs"].shape[0] == 1

    model = MVTracker(
        sliding_window_len=4, stride=4, fmaps_dim=16, num_heads=2, hidden_size=32,
        space_depth=1, time_depth=1, num_virtual_tracks=4, corr_n_levels=1,
        corr_neighbors=4,
    )
    optimizer = step_lib.make_optimizer(total_steps=10)
    example = {k: v[0] for k, v in batch.items() if v is not None}
    state = step_lib.init_state(model, optimizer, example, jax.random.PRNGKey(0), iters=1)
    train_step = step_lib.make_train_step(model, optimizer, iters=1)
    state, metrics = train_step(state, {k: v for k, v in batch.items() if v is not None})
    assert np.isfinite(float(metrics["loss"]))


def test_droid_track_cli_mask_guided_queries(processed_episode, tmp_path):
    """Object-mask ingestion e2e (reference `object_detection.py` output
    consumed for query sampling, SURVEY §2.7): a masks.npz restricting the
    left image half must confine every depth-sampled query to masked
    pixels when reprojected."""
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    out_dir, _ = processed_episode
    w_img = 320
    mask = np.zeros((240, w_img), np.float32)
    mask[:, : w_img // 2] = 1.0
    np.savez_compressed(os.path.join(out_dir, "masks.npz"), cam100=mask)
    try:
        out_npz = str(tmp_path / "pred_masked.npz")
        from mvtracker_tpu.cli import droid as droid_cli

        droid_cli.main(
            [
                "track",
                "--episode", out_dir,
                "--out", out_npz,
                "--queries", "depth",
                "--num_queries", "12",
                "--iters", "1",
                "--grid_size", "0",
                "--interp_shape", "128", "128",
                "--max_frames", "6",
                "--dtype", "float32",
            ]
        )
        with np.load(out_npz) as z:
            q = z["queries"]
        assert q.shape == (12, 4)
        dp = load_droid_episode(out_dir, max_frames=6)
        pix, zc = geo.world_to_pixel_xy_and_camera_z(
            jnp.asarray(q[None, :, 1:]),
            jnp.asarray(dp.intrs[0, 0][None]),
            jnp.asarray(dp.extrs[0, 0][None]),
        )
        x = np.asarray(pix)[0, :, 0]
        assert (x < w_img / 2 + 1.0).all(), f"queries escaped the mask: {x}"
    finally:
        os.remove(os.path.join(out_dir, "masks.npz"))
