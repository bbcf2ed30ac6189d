"""Geometry round-trip tests, mirroring the reference's runtime invariants
(reference `cli/train.py:194-204`: project->lift must reproduce world points)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.utils import geometry as geo


def random_camera(rng, n_frames=5):
    """Random plausible intrinsics + extrinsics."""
    f = rng.uniform(200, 800, size=(n_frames, 2))
    c = rng.uniform(100, 300, size=(n_frames, 2))
    intrs = np.zeros((n_frames, 3, 3))
    intrs[:, 0, 0] = f[:, 0]
    intrs[:, 1, 1] = f[:, 1]
    intrs[:, 0, 2] = c[:, 0]
    intrs[:, 1, 2] = c[:, 1]
    intrs[:, 2, 2] = 1.0

    # Random rotation via QR, translation placing camera away from origin.
    extrs = np.zeros((n_frames, 3, 4))
    for i in range(n_frames):
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        extrs[i, :, :3] = q
        extrs[i, :, 3] = rng.normal(size=3) * 0.2 + np.array([0, 0, 5.0])
    return jnp.asarray(intrs, jnp.float32), jnp.asarray(extrs, jnp.float32)


def test_project_unproject_roundtrip(rng):
    n_frames, n_points = 5, 64
    intrs, extrs = random_camera(rng, n_frames)
    world = jnp.asarray(rng.normal(size=(n_frames, n_points, 3)), jnp.float32)

    pix, z = geo.world_to_pixel_xy_and_camera_z(world, intrs, extrs)
    world2 = geo.pixel_xy_and_camera_z_to_world(
        pix, z, geo.invert_intrinsics(intrs), geo.invert_extrinsics(extrs)
    )
    np.testing.assert_allclose(np.asarray(world2), np.asarray(world), atol=1e-3)


def test_extrinsics_inverse_is_rigid_inverse(rng):
    _, extrs = random_camera(rng, 3)
    inv = np.asarray(geo.invert_extrinsics(extrs))
    r = np.asarray(extrs)[:, :, :3]
    t = np.asarray(extrs)[:, :, 3]
    expect_r = np.transpose(r, (0, 2, 1))
    expect_t = -np.einsum("fij,fj->fi", expect_r, t)
    np.testing.assert_allclose(inv[:, :3, :3], expect_r, atol=1e-5)
    np.testing.assert_allclose(inv[:, :3, 3], expect_t, atol=1e-5)


def test_unproject_depth_matches_pointwise(rng):
    """Depth-map unprojection must agree with the pointwise lift."""
    h, w, stride = 12, 16, 4
    intrs, extrs = random_camera(rng, 1)
    depth = jnp.asarray(rng.uniform(1.0, 5.0, size=(1, h, w)), jnp.float32)

    world = geo.unproject_depth_to_world(
        depth, geo.invert_intrinsics(intrs), geo.invert_extrinsics(extrs), stride
    )

    grid = geo.pixel_grid(h, w, stride)  # [H, W, 2]
    pix = grid.reshape(1, -1, 2)
    z = depth.reshape(1, -1, 1)
    world_pointwise = geo.pixel_xy_and_camera_z_to_world(
        pix, z, geo.invert_intrinsics(intrs), geo.invert_extrinsics(extrs)
    )
    np.testing.assert_allclose(
        np.asarray(world).reshape(1, -1, 3), np.asarray(world_pointwise), atol=1e-3
    )


def test_pointcloud_shapes_and_validity(rng):
    b, v, s, h, w, c = 1, 2, 3, 16, 24, 8
    fmaps = jnp.asarray(rng.normal(size=(b, v, s, h, w, c)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.0, 5.0, size=(b, v, s, h, w)), jnp.float32)
    depth = depth.at[0, 0, 0, 0, 0].set(0.0)
    intrs, extrs = random_camera(rng, v * s)
    intrs = intrs.reshape(1, v, s, 3, 3)
    extrs = extrs.reshape(1, v, s, 3, 4)

    for level in (0, 1):
        hh, ww = h // 2**level, w // 2**level
        xyz, fvec, valid = geo.init_pointcloud_from_rgbd(
            fmaps, depth, intrs, extrs, stride=4, level=level, return_validity_mask=True
        )
        assert xyz.shape == (b * s, v * hh * ww, 3)
        assert fvec.shape == (b * s, v * hh * ww, c)
        assert valid.shape == (b * s, v * hh * ww)
    # level 0: the zeroed depth pixel must be invalid and is the first point
    # of frame 0 (flattening order is V, H, W within a frame).
    xyz, fvec, valid = geo.init_pointcloud_from_rgbd(
        fmaps, depth, intrs, extrs, stride=4, level=0, return_validity_mask=True
    )
    assert not bool(valid[0, 0])
    assert bool(valid[0, 1])


def test_pointcloud_level_pooling_semantics(rng):
    """Level-1 depth must be the nearest (even-index) subsample, and level-1
    features the 2x2 average — reference `model_utils.py:437-451`."""
    b, v, s, h, w, c = 1, 1, 1, 8, 8, 4
    fmaps = jnp.asarray(rng.normal(size=(b, v, s, h, w, c)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 2.0, size=(b, v, s, h, w)), jnp.float32)
    intrs, extrs = random_camera(rng, 1)
    intrs = intrs.reshape(1, 1, 1, 3, 3)
    extrs = extrs.reshape(1, 1, 1, 3, 4)

    xyz0, fvec0 = geo.init_pointcloud_from_rgbd(fmaps, depth, intrs, extrs, stride=4, level=0)
    xyz1, fvec1 = geo.init_pointcloud_from_rgbd(fmaps, depth, intrs, extrs, stride=4, level=1)

    f = np.asarray(fmaps)[0, 0, 0]
    expected_f1 = f.reshape(4, 2, 4, 2, c).mean(axis=(1, 3)).reshape(-1, c)
    np.testing.assert_allclose(np.asarray(fvec1[0]), expected_f1, atol=1e-6)


def test_bilinear_sample2d_center(rng):
    im = jnp.asarray(rng.normal(size=(1, 4, 4, 2)), jnp.float32)
    # Sampling exactly at integer pixel (1, 2) returns that pixel.
    out = geo.bilinear_sample2d(im, jnp.asarray([[2.0]]), jnp.asarray([[1.0]]))
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(im[0, 1, 2]), atol=1e-6)
    # Halfway between two pixels returns their mean.
    out = geo.bilinear_sample2d(im, jnp.asarray([[1.5]]), jnp.asarray([[0.0]]))
    expect = (np.asarray(im[0, 0, 1]) + np.asarray(im[0, 0, 2])) / 2
    np.testing.assert_allclose(np.asarray(out[0, 0]), expect, atol=1e-6)


def test_reduce_masked_mean():
    x = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    m = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(float(geo.reduce_masked_mean(x, m)), 1.5, atol=1e-5)
    per_row = geo.reduce_masked_mean(x, m, axis=1)
    np.testing.assert_allclose(np.asarray(per_row), [1.5, 0.0], atol=1e-4)


def test_reprojection_roundtrip_dev_guard(rng):
    """The runtime guard: clean geometry -> tiny deviation; near-plane
    points are excluded rather than tripping it."""
    intrs, extrs = random_camera(rng, n_frames=3)  # [T,3,3]/[T,3,4]
    v_intrs = jnp.stack([intrs, intrs])  # [V,T,...]
    v_extrs = jnp.stack([extrs, extrs])
    world = jnp.asarray(rng.normal(size=(3, 17, 3)), jnp.float32)  # [T,N,3]
    dev = float(geo.reprojection_roundtrip_dev(world, v_intrs, v_extrs))
    assert dev < 1e-2, dev

    # A point exactly on the camera plane (z=0) must be excluded, not blow up.
    cam_center = geo.invert_extrinsics(extrs)[..., :3, 3]  # [T,3]
    world_bad = world.at[0, 0].set(cam_center[0])
    dev_bad = float(geo.reprojection_roundtrip_dev(world_bad, v_intrs, v_extrs))
    assert np.isfinite(dev_bad) and dev_bad < 1e-2, dev_bad
