"""Episode-level wrist z-offset refinement (VERDICT r2 #5 done-criterion:
a known injected offset recovered to < 1 mm through the episode pipeline).

The fixture builds a synthetic DROID-layout episode whose recordings come
from the analytic multi-view renderer, so the wrist and external cameras
see the SAME surfaces with geometrically consistent depth; the wrist
POSES are then biased by a known offset along each pose's viewing axis —
the camera-mounting error mode the reference's ICP stage corrects
(`optimization.py:428-601`: the measured cloud is trusted, the wrist
extrinsic chain is not).
"""

import json
import os

import numpy as np
import pytest

from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.droid.depth_video import write_depth_video

Z_TRUE = 0.03  # injected wrist forward bias (3 cm = 30x the 1 mm criterion)


@pytest.fixture(scope="module")
def refine_episode(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("droid_refine")
    ep = str(tmp / "episode_000")
    dp = synthetic.render_scene(
        seed=9, n_views=3, n_frames=4, height=96, width=96, n_tracks=8,
        texture_detail=1.0,
    )
    v, t, h, w = dp.videodepth.shape
    cam_ids = ["wrist0", "100", "101"]
    os.makedirs(ep)

    # metadata + extrinsics in the processed-episode layout: view 0 plays
    # the wrist (per-frame cam->world poses), views 1-2 are external.
    meta = {
        "wrist_cam_serial": "wrist0",
        "camera_intrinsics": {
            cid: {"K": dp.intrs[vi, 0].tolist(), "width": w, "height": h}
            for vi, cid in enumerate(cam_ids)
        },
    }
    with open(os.path.join(ep, "metadata.json"), "w") as f:
        json.dump(meta, f)

    def c2w(extr):  # [3,4] world->cam -> [4,4] cam->world
        out = np.eye(4)
        out[:3, :3] = extr[:, :3].T
        out[:3, 3] = -extr[:, :3].T @ extr[:, 3]
        return out

    # Bias the wrist poses by -Z_TRUE along each viewing axis: the stored
    # calibration places the camera Z_TRUE too far back, so refinement must
    # recover +Z_TRUE to re-seat the (correct) wrist cloud onto the
    # externally observed surfaces.
    wrist_poses = []
    for ti in range(t):
        pose = c2w(dp.extrs[0, ti])
        pose[:3, 3] -= Z_TRUE * pose[:3, 2]
        wrist_poses.append(pose)
    np.savez_compressed(
        os.path.join(ep, "extrinsics.npz"),
        external_100=c2w(dp.extrs[1, 0]),
        external_101=c2w(dp.extrs[2, 0]),
        wrist=np.stack(wrist_poses),
    )
    np.savez_compressed(
        os.path.join(ep, "tracks.npz"), tracks_3d=dp.trajectory_3d
    )
    for vi, cid in enumerate(cam_ids):
        cam_dir = os.path.join(ep, "recordings", cid)
        os.makedirs(cam_dir)
        np.savez_compressed(
            os.path.join(cam_dir, "rgb.npz"), rgb=dp.video[vi].astype(np.uint8)
        )
        write_depth_video(os.path.join(cam_dir, "depth.mkv"), dp.videodepth[vi])
    return ep


def test_refine_recovers_injected_offset(refine_episode):
    from mvtracker_tpu.droid.refine import refine_episode_wrist_z

    out = refine_episode_wrist_z(
        refine_episode,
        n_frames=3,
        voxel=0.02,
        max_corr_dist=0.1,
        # Synthetic scenes sit meters from the cameras, not the DROID rig's
        # 15-75 cm tabletop band.
        wrist_depth_range=(0.5, 10.0),
        ext_depth_range=(0.5, 10.0),
        write=True,
    )
    assert out["status"] == "ok"
    assert out["frames_used"] >= 2
    assert abs(out["wrist_z_offset_m"] - Z_TRUE) < 1e-3, out

    # write=True applied the offset along each wrist pose's viewing axis
    # and recorded it in quality.json.
    data = np.load(os.path.join(refine_episode, "extrinsics.npz"))
    with open(os.path.join(refine_episode, "quality.json")) as f:
        quality = json.load(f)
    assert abs(quality["wrist_z_offset_m"] - out["wrist_z_offset_m"]) < 1e-9
    assert data["wrist"].shape[0] == 4


def test_refine_cli(refine_episode, capsys):
    from mvtracker_tpu.cli import droid as droid_cli

    droid_cli.main([
        "refine", "--episode", refine_episode, "--n_frames", "2",
        "--voxel", "0.02", "--max_corr_dist", "0.1",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # The fixture's extrinsics were already corrected by the write=True test
    # when it runs first; accept either the injected offset or ~zero.
    assert out["status"] in ("ok", "no_wrist_or_external")
