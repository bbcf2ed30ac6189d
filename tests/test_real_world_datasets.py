"""Round-trip tests for the Panoptic/DexYCB disk-format loaders using
synthetically written scenes."""

import os

import numpy as np
import pytest

from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.datasets.real_world import (
    DexYCBMultiViewDataset,
    PanopticStudioMultiViewDataset,
    dataset_from_name,
)


def write_panoptic_scene(scene, path):
    import imageio.v3 as iio

    os.makedirs(path, exist_ok=True)
    v, t, h, w, _ = scene.video.shape
    np.savez(
        os.path.join(path, "tapvid3d_annotations.npz"),
        trajectories=scene.trajectory_3d,
        trajectories_pixelspace=scene.trajectory,
        per_view_visibilities=scene.visibility,
        query_points_3d=scene.query_points_3d,
        extrinsics=scene.extrs,
        intrinsics=scene.intrs,
    )
    for vi in range(v):
        d = os.path.join(path, "ims", str(vi))
        os.makedirs(d, exist_ok=True)
        for ti in range(t):
            iio.imwrite(
                os.path.join(d, f"{ti:05d}.png"), scene.video[vi, ti].astype(np.uint8)
            )
    dd = os.path.join(path, "dynamic3dgs_depth")
    os.makedirs(dd, exist_ok=True)
    for vi in range(v):
        np.save(os.path.join(dd, f"depths_{vi:02d}.npy"), scene.videodepth[vi])


def write_dexycb_scene(scene, path):
    import imageio.v3 as iio

    os.makedirs(path, exist_ok=True)
    v, t, h, w, _ = scene.video.shape
    np.savez(
        os.path.join(path, "tracks_3d.npz"),
        tracks_3d=scene.trajectory_3d,
        per_view_visibilities=scene.visibility,
        query_points_3d=scene.query_points_3d,
    )
    for vi in range(v):
        vp = os.path.join(path, f"view_{vi}")
        os.makedirs(os.path.join(vp, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(vp, "depth"), exist_ok=True)
        for ti in range(t):
            iio.imwrite(
                os.path.join(vp, "rgb", f"{ti:05d}.png"),
                scene.video[vi, ti].astype(np.uint8),
            )
            mm = np.clip(scene.videodepth[vi, ti] * 1000, 0, 65535).astype(np.uint16)
            iio.imwrite(os.path.join(vp, "depth", f"{ti:05d}.png"), mm)
        np.savez(
            os.path.join(vp, "intrinsics_extrinsics.npz"),
            K=scene.intrs[vi, 0],
            extr=scene.extrs[vi, 0],
        )


@pytest.fixture(scope="module")
def scene():
    return synthetic.render_scene(seed=11, n_views=2, n_frames=3, height=32, width=40, n_tracks=8)


def test_panoptic_roundtrip(scene, tmp_path):
    root = tmp_path / "panoptic"
    write_panoptic_scene(scene, str(root / "seq0"))
    ds = PanopticStudioMultiViewDataset(str(root), traj_per_sample=8)
    assert len(ds) == 1
    dp = ds[0]
    assert dp.video.shape == scene.video.shape
    np.testing.assert_allclose(dp.videodepth, scene.videodepth, atol=1e-5)
    np.testing.assert_allclose(dp.extrs, scene.extrs, atol=1e-6)
    assert dp.trajectory_3d.shape[1] <= 8


def test_panoptic_view_subset(scene, tmp_path):
    root = tmp_path / "panoptic"
    write_panoptic_scene(scene, str(root / "seq0"))
    ds = PanopticStudioMultiViewDataset(str(root), views_to_return=[1], traj_per_sample=8)
    dp = ds[0]
    assert dp.video.shape[0] == 1
    np.testing.assert_allclose(dp.video[0], scene.video[1].astype(np.uint8), atol=1)


def test_dexycb_roundtrip(scene, tmp_path):
    root = tmp_path / "dexycb"
    write_dexycb_scene(scene, str(root / "seq0"))
    ds = DexYCBMultiViewDataset(str(root), traj_per_sample=8)
    assert len(ds) == 1
    dp = ds[0]
    assert dp.video.shape == scene.video.shape
    np.testing.assert_allclose(dp.videodepth, scene.videodepth, atol=2e-3)
    assert dp.query_points_3d.shape[1] == 4


def test_from_name_grammar(scene, tmp_path):
    root = tmp_path
    write_panoptic_scene(scene, str(root / "panoptic-multiview" / "seq0"))
    ds = dataset_from_name("panoptic-multiview-views0_1", str(root))
    assert ds.views_to_return == [0, 1]


def test_panoptic_default_views_are_camera_ids(scene, tmp_path):
    """Dome scenes expose sparse camera-id-named dirs (ims/0, ims/2, ...);
    the default view list must be those ids, not range(n_dirs) — positional
    defaults opened ims/1 on such a scene and crashed."""
    import shutil

    root = tmp_path / "panoptic" / "seq"
    write_panoptic_scene(scene, str(root))
    # Rename camera 1 -> camera 2 (sparse ids), and move its annotation
    # rows: pad arrays so row index == camera id.
    shutil.move(str(root / "ims" / "1"), str(root / "ims" / "2"))
    shutil.move(
        str(root / "dynamic3dgs_depth" / "depths_01.npy"),
        str(root / "dynamic3dgs_depth" / "depths_02.npy"),
    )
    ann = dict(np.load(root / "tapvid3d_annotations.npz"))
    for k in ("trajectories_pixelspace", "per_view_visibilities", "extrinsics", "intrinsics"):
        a = ann[k]
        ann[k] = np.concatenate([a, a[1:2]], axis=0)  # row 2 := old row 1
    np.savez(root / "tapvid3d_annotations.npz", **ann)

    ds = PanopticStudioMultiViewDataset(str(tmp_path / "panoptic"), traj_per_sample=8)
    dp = ds[0]
    assert dp.video.shape[0] == 2  # cameras 0 and 2
    np.testing.assert_allclose(dp.videodepth[1], scene.videodepth[1])
