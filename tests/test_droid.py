"""DROID data-factory tests: kinematics parity with scipy, synthetic episode
round-trip through the full metadata pipeline."""

import json
import os

import numpy as np
import pytest

from mvtracker_tpu.droid import gripper, pipeline, transforms


def test_euler_xyz_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R

    rpy = rng.uniform(-np.pi, np.pi, size=(20, 3))
    ours = transforms.euler_xyz_to_matrix(rpy)
    theirs = R.from_euler("xyz", rpy).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_rotvec_matches_scipy(rng):
    from scipy.spatial.transform import Rotation as R

    for _ in range(10):
        rv = rng.normal(size=3)
        np.testing.assert_allclose(
            transforms.rotvec_to_matrix(rv), R.from_rotvec(rv).as_matrix(), atol=1e-12
        )


def test_finger_transforms_open_close():
    """Closing the gripper must move the fingertips toward each other."""
    ee = np.eye(4)

    def tip_distance(g):
        tl, tr = gripper.compute_finger_transforms(ee, g)
        return np.linalg.norm(tl[:3, 3] - tr[:3, 3])

    assert tip_distance(1.0) < tip_distance(0.0)


def test_contact_tracker_fk_rigidity(rng):
    """Contact points must move rigidly with the EE pose."""
    tracker = gripper.ContactSurfaceTracker(num_track_points=9)
    ee1 = np.eye(4)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    ee2 = np.eye(4)
    ee2[:3, :3] = q
    ee2[:3, 3] = [0.1, 0.2, 0.3]

    l1, r1 = tracker.contact_points_world(ee1, 0.5)
    l2, r2 = tracker.contact_points_world(ee2, 0.5)
    # l2 should equal the rigid transform of l1.
    np.testing.assert_allclose(l2, (q @ l1.T).T + ee2[:3, 3], atol=1e-10)
    np.testing.assert_allclose(r2, (q @ r1.T).T + ee2[:3, 3], atol=1e-10)


def test_normalized_flow_arclength():
    """A constant-speed straight line resamples to ~1mm-spaced steps."""
    t = 50
    centroids = np.zeros((t, 3))
    centroids[:, 0] = np.linspace(0, 0.02, t)  # 20mm total
    frames = np.tile(np.eye(4), (t, 1, 1))
    out = pipeline.compute_normalized_flow(centroids, frames, step_size_mm=1.0)
    assert abs(out["num_normalized_steps"] - 21) <= 1
    steps = np.linalg.norm(np.diff(out["normalized_centroids"], axis=0), axis=1)
    np.testing.assert_allclose(steps, 0.001, atol=1e-4)


def make_episode(tmp_path, t=30):
    import h5py

    ep = tmp_path / "episode_000"
    ep.mkdir()
    rng = np.random.default_rng(0)
    # Smooth EE trajectory.
    ts = np.linspace(0, 1, t)
    cart = np.zeros((t, 6))
    cart[:, 0] = 0.4 + 0.1 * np.sin(2 * np.pi * ts)
    cart[:, 1] = 0.2 * ts
    cart[:, 2] = 0.3 + 0.05 * np.cos(2 * np.pi * ts)
    cart[:, 3:] = 0.3 * rng.standard_normal(3)[None] * ts[:, None]
    grip = np.clip(ts, 0, 1)[:, None]
    with h5py.File(ep / "trajectory.h5", "w") as f:
        f.create_dataset("observation/robot_state/cartesian_position", data=cart)
        f.create_dataset("observation/robot_state/gripper_position", data=grip)

    k = [[300.0, 0, 160], [0, 300, 120], [0, 0, 1]]
    meta = {
        "cam2base": {"100": [0.5, 0.5, 0.5, 0.1, 0.2, 0.3]},
        "wrist_cam_serial": "200",
        "wrist_cam_extrinsics": [0.45, 0.05, 0.35, 0.0, 0.1, 0.0],
        "camera_intrinsics": {
            "100": {"K": k, "width": 320, "height": 240},
            "200": {"K": k, "width": 320, "height": 240},
        },
    }
    with open(ep / "metadata.json", "w") as f:
        json.dump(meta, f)
    return str(ep)


def test_process_episode_end_to_end(tmp_path):
    ep = make_episode(tmp_path)
    out_dir = str(tmp_path / "out")
    result = pipeline.process_episode(ep, out_dir, num_track_points=9)
    assert result["status"] == "ok"
    tracks = np.load(os.path.join(out_dir, "tracks.npz"))
    assert tracks["tracks_3d"].shape == (30, 18, 3)
    assert "tracks_2d_100" in tracks and "tracks_2d_200" in tracks
    extr = np.load(os.path.join(out_dir, "extrinsics.npz"))
    assert extr["external_100"].shape == (4, 4)
    assert extr["wrist"].shape == (30, 4, 4)
    with open(os.path.join(out_dir, "quality.json")) as f:
        q = json.load(f)
    assert q["num_frames"] == 30
    # Idempotency: second run skips.
    assert pipeline.process_episode(ep, out_dir)["status"] == "skipped"


def test_wrist_camera_tracks_consistency(tmp_path):
    """The wrist camera rides the EE: contact points keep a near-constant
    position in the wrist camera frame when only the arm (not the gripper)
    moves — validating the R_fix offset chain (reference
    `generate_tracks_and_metadata.py:432-460`)."""
    import h5py

    ep = tmp_path / "ep"
    ep.mkdir()
    t = 10
    cart = np.zeros((t, 6))
    cart[:, 0] = np.linspace(0.3, 0.6, t)
    cart[:, 4] = np.linspace(0, 0.8, t)  # pitch changes too
    grip = np.full((t, 1), 0.5)
    with h5py.File(ep / "trajectory.h5", "w") as f:
        f.create_dataset("observation/robot_state/cartesian_position", data=cart)
        f.create_dataset("observation/robot_state/gripper_position", data=grip)

    tracks = pipeline.generate_tracks(str(ep / "trajectory.h5"), num_track_points=4)
    extr = pipeline.compute_extrinsics(
        str(ep / "trajectory.h5"),
        {},
        wrist_cam_serial="w",
        wrist_cam_extrinsics=[0.35, 0.0, 0.35, 0.0, 0.0, 0.0],
    )
    cam_t_world = np.linalg.inv(extr["wrist_extrinsics"])  # [T, 4, 4]
    pts_h = np.concatenate(
        [tracks["tracks_3d"], np.ones_like(tracks["tracks_3d"][..., :1])], -1
    )
    cam_pts = np.einsum("tij,tnj->tni", cam_t_world[:, :3], pts_h)
    # Constant gripper opening + rigid mount => constant camera-frame coords.
    spread = cam_pts.std(axis=0).max()
    assert spread < 1e-6, spread


def test_ffv1_depth_video_roundtrip(tmp_path, rng):
    """Lossless (to mm) depth video round trip in the reference's on-disk
    format (`extract_rgb_depth.py:217-312`)."""
    from mvtracker_tpu.droid.depth_video import read_depth_video, write_depth_video

    depth = rng.uniform(0.2, 5.0, size=(4, 32, 48)).astype(np.float32)
    path = str(tmp_path / "depth.mkv")
    write_depth_video(path, depth)
    back = read_depth_video(path)
    assert back.shape == depth.shape
    # Quantized to millimeters; lossless beyond that.
    np.testing.assert_allclose(back, np.floor(depth * 1000) / 1000, atol=1e-6)  # writer floors to mm (reference astype(uint16))
    import json

    with open(path + ".json") as f:
        meta = json.load(f)
    assert meta["format"] == "ffv1_depth_z16"
    assert meta["frame_count"] == 4


def test_quality_ordering_interleaves_labs():
    """Best episode of each lab first, then second best, etc. (reference
    `get_episodes_by_quality.py:66-108`)."""
    from mvtracker_tpu.droid.quality import episode_quality, order_episodes_by_quality

    t6 = [0.0] * 6
    cam2base = {
        "LABA+s1+2023-01-01-01h-01m-01s": {"100": t6, "101": t6},       # score 22
        "LABA+s1+2023-01-01-02h-02m-02s": {"100": t6},                   # score 11
        "LABB+s2+2023-01-02-01h-01m-01s": {"100": t6, "101": t6, "102": t6},  # 33
        "LABB+s2+2023-01-02-02h-02m-02s": {"100": [0.0] * 3},            # 10 (invalid tf)
        "not-an-episode": {"100": t6},
    }
    order = order_episodes_by_quality(cam2base)
    assert order == [
        "LABA+s1+2023-01-01-01h-01m-01s",
        "LABB+s2+2023-01-02-01h-01m-01s",
        "LABA+s1+2023-01-01-02h-02m-02s",
        "LABB+s2+2023-01-02-02h-02m-02s",
    ]
    assert episode_quality({"100": t6}) == 11.0
    assert order_episodes_by_quality(cam2base, limit=2) == order[:2]


def test_hub_local_store_roundtrip(tmp_path):
    from mvtracker_tpu.droid.hub import LocalStore, download_episode, episode_available

    store = LocalStore(str(tmp_path / "store"))
    ep = tmp_path / "ep0"
    ep.mkdir()
    (ep / "tracks.npz").write_bytes(b"data")
    assert not episode_available(store, "ep0")
    store.upload_dir(str(ep), "ep0")
    assert episode_available(store, "ep0")
    assert episode_available(store, "ep0", skip_check=True) is False
    out = download_episode(store, "ep0", str(tmp_path / "dl"))
    assert os.path.exists(os.path.join(out, "tracks.npz"))
    assert store.list_keys() == ["ep0"]


def test_batch_uploader(tmp_path):
    from mvtracker_tpu.droid.hub import BatchUploader, LocalStore

    store = LocalStore(str(tmp_path / "store"))
    up = BatchUploader(store, str(tmp_path / "staging"), batch_size=2, interval_s=9999)
    for i in range(3):
        ep = tmp_path / f"ep{i}"
        ep.mkdir()
        (ep / "quality.json").write_text("{}")
        up.stage(str(ep), f"ep{i}")
    # batch_size=2: first two flushed automatically, third pending.
    assert up.status()["uploaded"] == 2
    assert up.status()["pending"] == 1
    up.flush()
    assert up.status()["uploaded"] == 3
    assert sorted(store.list_keys()) == ["ep0", "ep1", "ep2"]


def test_batch_uploader_failure_isolation(tmp_path):
    from mvtracker_tpu.droid.hub import ArtifactStore, BatchUploader

    class FlakyStore(ArtifactStore):
        def __init__(self):
            self.ok = []

        def upload_dir(self, local_dir, key):
            if key == "bad":
                raise RuntimeError("boom")
            self.ok.append(key)

    store = FlakyStore()
    up = BatchUploader(store, str(tmp_path / "staging"), batch_size=100)
    for key in ("good1", "bad", "good2"):
        ep = tmp_path / key
        ep.mkdir()
        (ep / "x").write_text("x")
        up.stage(str(ep), key)
    up.flush()
    s = up.status()
    assert s["uploaded"] == 2 and s["failed"] == 1
    assert (tmp_path / "staging" / "failed_uploads.txt").read_text().strip() == "bad"


def test_batch_uploader_interval_flush_without_new_work(tmp_path):
    """The interval flush must fire from the background timer even when no
    further stage() call arrives (the reference's periodic upload loop) —
    previously a sub-batch staged before a crash was never uploaded."""
    import time

    from mvtracker_tpu.droid.hub import BatchUploader, LocalStore

    store = LocalStore(str(tmp_path / "store"))
    up = BatchUploader(store, str(tmp_path / "staging"), batch_size=100, interval_s=0.3)
    ep = tmp_path / "ep0"
    ep.mkdir()
    (ep / "quality.json").write_text("{}")
    up.stage(str(ep), "ep0")  # below batch_size: no inline flush
    deadline = time.time() + 10
    while up.status()["uploaded"] < 1 and time.time() < deadline:
        time.sleep(0.05)
    assert up.status()["uploaded"] == 1
    up.close()


def test_process_episodes_batch_multiprocess(tmp_path):
    """num_workers > 1 must actually process (the worker must cross the
    ProcessPoolExecutor pickle boundary — a nested closure cannot, which
    made every episode 'fail' silently)."""
    eps = []
    for i in range(2):
        parent = tmp_path / f"e{i}"
        parent.mkdir()
        ep = make_episode(parent, t=10)
        eps.append(ep)  # distinct parents -> distinct out keys? no:
    # make_episode hardcodes the basename; rename for distinct output keys.
    renamed = []
    for i, ep in enumerate(eps):
        dst = os.path.join(os.path.dirname(ep), f"episode_{i:03d}")
        if dst != ep:
            os.rename(ep, dst)
        renamed.append(dst)
    eps = renamed
    out_root = str(tmp_path / "out")
    results = pipeline.process_episodes_batch(
        eps, out_root, num_workers=2, num_track_points=6
    )
    assert results == {"ok": 2, "skipped": 0, "failed": 0}, results
    assert not os.path.exists(os.path.join(out_root, "failed_episodes.txt"))


def test_render_cli_estimates_zed_intrinsics(tmp_path, caplog):
    """Reference parity (`render_tracks_from_mp4.py:567-596`): with no cached
    2D tracks and no --intrinsics, the render CLI estimates ZED intrinsics
    from the actual video dimensions instead of projecting through identity."""
    import imageio.v3 as iio

    from mvtracker_tpu.cli import droid as droid_cli
    from mvtracker_tpu.droid.transforms import estimate_zed_intrinsics

    k = estimate_zed_intrinsics(1280, 720)
    assert abs(k[0, 0] - 0.42 * 1280) < 1e-6 and k[0, 2] == 640.0

    ep = tmp_path / "ep"
    ep.mkdir()
    t, n = 4, 3
    rng = np.random.default_rng(0)
    tracks_3d = rng.uniform(-0.2, 0.2, size=(t, n, 3)) + [0, 0, 0.8]
    np.savez(ep / "tracks.npz", tracks_3d=tracks_3d)
    pose = np.eye(4)
    pose[2, 3] = -0.2  # camera slightly behind origin looking +z
    np.savez(ep / "extrinsics.npz", external_7=pose)
    vid_dir = tmp_path / "frames"
    vid_dir.mkdir()
    for i in range(t):
        iio.imwrite(vid_dir / f"{i:03d}.png",
                    np.zeros((48, 64, 3), np.uint8))
    out = tmp_path / "out.gif"
    import logging

    with caplog.at_level(logging.INFO):
        droid_cli.main([
            "render", "--episode_out", str(ep), "--video", str(vid_dir),
            "--camera", "7", "--out", str(out),
        ])
    assert out.exists()
    assert any("estimated ZED K" in r.message for r in caplog.records)


def _suicidal_worker(ep, out_root, kwargs):
    """Module-level (picklable) stand-in worker: the 'die' episode SIGKILLs
    its own worker process on the first attempt, then succeeds."""
    import signal

    marker = os.path.join(out_root, "died_once")
    if "die" in ep and not os.path.exists(marker):
        with open(marker, "w") as f:
            f.write("x")
        os.kill(os.getpid(), signal.SIGKILL)
    return {"status": "ok"}


def test_batch_survives_killed_worker(tmp_path):
    """A worker that DIES mid-episode (not raises — killed) must leave a
    failure log and must not poison the rest of the batch (reference
    behavior: per-episode error-count files in the shell pool,
    `run_pipeline_cluster_huggingface_compressed_lossy.sh`). Uses the
    spawn-context pool's worker_fn injection point (the suicidal worker
    must be importable in the spawned child)."""
    out = str(tmp_path / "out")
    eps = ["ep_a", "ep_die", "ep_b", "ep_c", "ep_d"]
    res = pipeline.process_episodes_batch(
        eps, out, num_workers=2, worker_fn=_suicidal_worker
    )
    # The killed episode is retried in a fresh pool and succeeds; nothing
    # else is lost.
    assert res["ok"] == len(eps), res
    assert res["failed"] == 0, res
    log = (tmp_path / "out" / "failed_episodes.txt").read_text()
    assert "pool broken" in log
