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
