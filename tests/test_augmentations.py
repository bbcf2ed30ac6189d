"""Augmentation invariants: geometry stays consistent after every aug."""

import numpy as np
import pytest

from mvtracker_tpu.datasets import augmentations as aug
from mvtracker_tpu.datasets import synthetic


@pytest.fixture()
def scene():
    return synthetic.render_scene(seed=9, n_views=2, n_frames=4, height=48, width=64, n_tracks=8)


def proj_consistency(dp, atol=2e-2):
    """Visible GT tracks must project to their stored 2D positions."""
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    v, t = dp.visibility.shape[:2]
    for vi in range(v):
        pix, z = geo.world_to_pixel_xy_and_camera_z(
            jnp.asarray(dp.trajectory_3d),
            jnp.asarray(dp.intrs[vi]),
            jnp.asarray(dp.extrs[vi]),
        )
        vis = dp.visibility[vi]
        err = np.abs(np.asarray(pix) - dp.trajectory[vi, :, :, :2])[vis]
        assert err.max() < atol, err.max()


def test_photometric_keeps_geometry(scene):
    rng = np.random.default_rng(0)
    out = aug.photometric_augment(scene, rng)
    assert out.video.shape == scene.video.shape
    np.testing.assert_array_equal(out.trajectory_3d, scene.trajectory_3d)
    assert not np.allclose(out.video, scene.video)


def test_crop_updates_intrinsics(scene):
    rng = np.random.default_rng(0)
    out = aug.crop_augment(scene, rng, 32, 48)
    assert out.video.shape[2:4] == (32, 48)
    proj_consistency(out)


def test_scene_transform_consistency(scene):
    rng = np.random.default_rng(1)
    out = aug.scene_transform_augment(scene, rng)
    # Projections of transformed 3D tracks through transformed cameras must
    # match the (x, y) of the stored 2D tracks (z is scaled).
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    vi = 0
    pix, z = geo.world_to_pixel_xy_and_camera_z(
        jnp.asarray(out.trajectory_3d),
        jnp.asarray(out.intrs[vi]),
        jnp.asarray(out.extrs[vi]),
    )
    vis = out.visibility[vi]
    err = np.abs(np.asarray(pix) - out.trajectory[vi, :, :, :2])[vis]
    assert err.max() < 5e-2, err.max()
    # Query points still coincide with GT tracks at query frames.
    for i in range(out.query_points_3d.shape[0]):
        t0 = int(out.query_points_3d[i, 0])
        np.testing.assert_allclose(
            out.query_points_3d[i, 1:], out.trajectory_3d[t0, i], atol=1e-4
        )


def test_depth_corruption_changes_depth_only(scene):
    rng = np.random.default_rng(2)
    out = aug.depth_corruption_augment(scene, rng, erase_prob=1.0, patch_aug_prob=1.0)
    np.testing.assert_array_equal(out.trajectory_3d, scene.trajectory_3d)
    assert not np.allclose(out.videodepth, scene.videodepth)


def test_default_stack_runs(scene):
    rng = np.random.default_rng(3)
    out = aug.default_train_augmentations(scene, rng)
    assert out.video.shape == scene.video.shape
    assert np.isfinite(out.videodepth).all()


def test_eraser_and_replace_knock_out_visibility(scene):
    """Occluder rectangles must only REMOVE visibility, leave geometry/GT
    untouched, and actually modify pixels (reference kubric:1295-1366)."""
    rng = np.random.default_rng(4)
    for fn in (aug.eraser_augment, aug.replace_augment):
        out = fn(scene, rng, prob=1.0)
        assert not np.allclose(out.video, scene.video)
        np.testing.assert_array_equal(out.trajectory_3d, scene.trajectory_3d)
        np.testing.assert_array_equal(out.videodepth, scene.videodepth)
        lost = scene.visibility & ~out.visibility
        gained = out.visibility & ~scene.visibility
        assert not gained.any()
        assert lost.sum() >= 0  # monotone removal
        # Frame 0 is never erased (reference starts at frame 1).
        np.testing.assert_array_equal(out.visibility[:, 0], scene.visibility[:, 0])


def test_depth_eraser_replace(scene):
    rng = np.random.default_rng(5)
    out = aug.depth_eraser_replace_augment(
        scene, rng, eraser_prob=1.0, replace_prob=1.0
    )
    assert not np.allclose(out.videodepth, scene.videodepth)
    np.testing.assert_array_equal(out.video, scene.video)
    assert not (out.visibility & ~scene.visibility).any()
    np.testing.assert_array_equal(out.videodepth[:, 0], scene.videodepth[:, 0])


def test_scaled_crop_projection_consistency(scene):
    """After pad+scale+crop, projecting the (unchanged) world tracks with
    the UPDATED intrinsics must land on the UPDATED 2D tracks — the
    intrinsics bookkeeping of reference kubric:1405-1568."""
    rng = np.random.default_rng(6)
    out = aug.scaled_crop_augment(scene, rng, 48, 48)
    v, t = out.video.shape[:2]
    for vi in range(v):
        for ti in range(0, t, 3):
            xyz_h = np.concatenate(
                [out.trajectory_3d[ti], np.ones((out.trajectory_3d.shape[1], 1))], -1
            )
            cam = (out.extrs[vi, ti] @ xyz_h.T).T
            pix = (out.intrs[vi, ti] @ cam.T).T
            pix = pix[:, :2] / np.maximum(pix[:, 2:], 1e-6)
            np.testing.assert_allclose(
                pix, out.trajectory[vi, ti, :, :2], atol=1e-2,
                err_msg=f"view {vi} frame {ti}",
            )
    assert out.video.shape[2:4] == (48, 48)
    # Visibility re-clipped to the crop.
    inb = (
        (out.trajectory[..., 0] >= 0) & (out.trajectory[..., 0] < 48)
        & (out.trajectory[..., 1] >= 0) & (out.trajectory[..., 1] < 48)
    )
    assert not (out.visibility & ~inb).any()


def test_frame_shared_photometric(scene):
    rng = np.random.default_rng(7)
    out = aug.photometric_augment(scene, rng, frame_shared=True, hue=0.2)
    assert not np.allclose(out.video, scene.video)
    np.testing.assert_array_equal(out.videodepth, scene.videodepth)
