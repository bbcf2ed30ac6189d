"""Synthetic dataset + datapoint utility tests.

The synthetic renderer must satisfy the geometric contracts the real loaders
guarantee (reference `kubric_multiview_dataset.py:1114` 2D-projection sanity
check): unprojecting rendered depth at a track's pixel must recover the
track's world position.
"""

import numpy as np
import pytest

from mvtracker_tpu.datasets import datapoint as dp
from mvtracker_tpu.datasets import synthetic


@pytest.fixture(scope="module")
def scene():
    return synthetic.render_scene(seed=1, n_views=3, n_frames=6, height=48, width=64, n_tracks=16)


def test_shapes(scene):
    v, t, h, w = 3, 6, 48, 64
    n = 16
    assert scene.video.shape == (v, t, h, w, 3)
    assert scene.videodepth.shape == (v, t, h, w)
    assert scene.trajectory_3d.shape == (t, n, 3)
    assert scene.visibility.shape == (v, t, n)
    assert scene.query_points_3d.shape == (n, 4)


def test_depth_unprojection_consistency(scene):
    """Rendered depth + camera model must reproduce visible track positions."""
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    v, t = scene.visibility.shape[:2]
    checked = 0
    for vi in range(v):
        for ti in range(t):
            vis = scene.visibility[vi, ti]
            if not vis.any():
                continue
            pix = scene.trajectory[vi, ti, vis, :2]
            z = scene.trajectory[vi, ti, vis, 2:]
            world = geo.pixel_xy_and_camera_z_to_world(
                jnp.asarray(pix[None]),
                jnp.asarray(z[None]),
                geo.invert_intrinsics(jnp.asarray(scene.intrs[vi, ti][None])),
                geo.invert_extrinsics(jnp.asarray(scene.extrs[vi, ti][None])),
            )
            np.testing.assert_allclose(
                np.asarray(world[0]), scene.trajectory_3d[ti, vis], atol=1e-2
            )
            checked += 1
    assert checked > 0


def test_visibility_is_plausible(scene):
    """Most tracks should be visible in at least one view at some point."""
    vis_any = scene.visibility.any(axis=0)
    assert vis_any.any(axis=0).mean() > 0.5


def test_collate(scene):
    batch = dp.collate([scene, scene])
    assert batch["rgbs"].shape[0] == 2
    assert batch["vis_gt"].shape == (2, 6, 16)
    assert batch["query_points"].shape == (2, 16, 4)


def test_transform_scene_roundtrip(scene):
    """transform then inverse-transform must restore world points and keep
    projections consistent (reference `transform_scene` contract)."""
    rng = np.random.default_rng(0)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    s, t_vec = 2.0, np.array([0.3, -0.2, 0.5])

    depth_t, extrs_t, qp_t, traj3d_t, traj2d_t = dp.transform_scene(
        s, q, t_vec,
        depth=scene.videodepth,
        extrs=scene.extrs,
        query_points=scene.query_points_3d,
        traj3d_world=scene.trajectory_3d,
        traj2d_w_z=scene.trajectory,
    )
    # Projection consistency: transformed world points through transformed
    # cameras give the same pixels.
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    vi, ti = 0, 0
    pix_new, z_new = geo.world_to_pixel_xy_and_camera_z(
        jnp.asarray(traj3d_t[ti][None]),
        jnp.asarray(scene.intrs[vi, ti][None]),
        jnp.asarray(extrs_t[vi, ti][None]),
    )
    vis = scene.visibility[vi, ti]
    np.testing.assert_allclose(
        np.asarray(pix_new[0])[vis], scene.trajectory[vi, ti, vis, :2], atol=1e-2
    )
    np.testing.assert_allclose(
        np.asarray(z_new[0, :, 0])[vis], scene.trajectory[vi, ti, vis, 2] * s, atol=1e-2
    )

    # Inverse restores the original world trajectory.
    s_inv = 1.0 / s
    r_inv = q.T
    t_inv = -r_inv @ t_vec / s
    _, _, _, traj3d_back, _ = dp.transform_scene(
        s_inv, r_inv, t_inv, traj3d_world=traj3d_t
    )
    np.testing.assert_allclose(traj3d_back, scene.trajectory_3d, atol=1e-5)


def test_aug_depth_preserves_invalid(scene):
    d = scene.videodepth.copy()
    d[0, 0, :10, :10] = 0
    out = dp.aug_depth(d, rng=np.random.default_rng(0))
    assert (out[0, 0, :10, :10] == 0).all()
    assert out.shape == d.shape


def test_align_umeyama_recovers_sim3():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(50, 3))
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    s_true, t_true = 1.7, np.array([1.0, -2.0, 0.5])
    model = s_true * (pts @ q.T) + t_true
    s, r, t = dp.align_umeyama(model, pts)
    np.testing.assert_allclose(s, s_true, atol=1e-6)
    np.testing.assert_allclose(r, q, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_texture_detail_photoconsistent_and_rng_stable():
    """texture_detail=0 is bit-identical to the historical renderer (the HF
    bands draw from a forked RNG); >0 changes only the RGB (geometry, depth,
    tracks, visibility identical) and the added pattern rides the surface
    (painted in local coords, like the base bands)."""
    base = dict(seed=3, n_views=2, n_frames=5, height=48, width=48, n_tracks=8)
    a = synthetic.render_scene(**base)
    b = synthetic.render_scene(texture_detail=0.0, **base)
    np.testing.assert_array_equal(a.video, b.video)

    c = synthetic.render_scene(texture_detail=1.0, **base)
    np.testing.assert_array_equal(a.videodepth, c.videodepth)
    np.testing.assert_array_equal(a.trajectory_3d, c.trajectory_3d)
    np.testing.assert_array_equal(a.visibility, c.visibility)
    diff = np.abs(a.video.astype(np.float32) - c.video.astype(np.float32))
    assert diff.max() > 5.0  # the detail bands actually show up
    # Only object pixels change; ground/background identical.
    obj = a.segmentation > 0
    assert np.all(diff[~obj] == 0)


def test_synthetic_disk_cache_roundtrip(tmp_path):
    """Disk-backed render cache: a second dataset instance (a restarted
    worker process in the supervised-training flow) loads the identical
    Datapoint instead of re-rendering; truncated files fall back to
    re-render."""
    from mvtracker_tpu.datasets.loader import SyntheticSceneDataset

    kw = dict(n_scenes=1, cache=False, seed=9, randomize=True,
              disk_cache_dir=str(tmp_path), n_views=2, n_frames=4,
              height=32, width=32, n_tracks=8)
    a = SyntheticSceneDataset(**kw)[0]
    files = list(tmp_path.iterdir())
    assert len(files) == 1
    b = SyntheticSceneDataset(**kw)[0]
    np.testing.assert_array_equal(a.video, b.video)
    np.testing.assert_array_equal(a.trajectory_3d, b.trajectory_3d)
    np.testing.assert_array_equal(a.visibility, b.visibility)
    assert b.seq_name == a.seq_name
    # Corrupt the cached file: loader must silently re-render.
    files[0].write_bytes(b"not an npz")
    c = SyntheticSceneDataset(**kw)[0]
    np.testing.assert_array_equal(a.video, c.video)


def test_compress_batch_for_transfer():
    from mvtracker_tpu.datasets.loader import (
        SyntheticSceneDataset,
        compress_batch_for_transfer,
    )
    from mvtracker_tpu.datasets.datapoint import collate

    ds = SyntheticSceneDataset(n_scenes=1, cache=True, seed=3, n_views=2,
                               n_frames=4, height=32, width=32, n_tracks=8)
    batch = collate([ds[0]])
    cb = compress_batch_for_transfer(batch)
    assert cb["rgbs"].dtype == np.uint8
    assert cb["depths"].dtype == np.float16
    # Payload shrinks ~3x; labels/geometry stay exact f32.
    orig = sum(v.nbytes for v in batch.values() if hasattr(v, "nbytes"))
    comp = sum(v.nbytes for v in cb.values() if hasattr(v, "nbytes"))
    assert comp < orig * 0.4
    np.testing.assert_array_equal(cb["traj_gt"], batch["traj_gt"])
    assert np.abs(cb["rgbs"].astype(np.float32) - batch["rgbs"]).max() <= 0.5
    assert np.abs(cb["depths"].astype(np.float32) - batch["depths"]).max() < 4e-3


def test_texture_noise_changes_appearance_only():
    """texture_noise adds hashed value-noise texture: pixels on objects
    change, geometry/tracks/visibility stay identical, and the default (0)
    keeps historical scenes bit-for-bit."""
    from mvtracker_tpu.datasets.synthetic import render_scene

    kw = dict(seed=5, n_views=2, n_frames=4, height=48, width=48, n_tracks=8,
              texture_detail=1.0)
    a = render_scene(**kw)
    a2 = render_scene(**kw)
    b = render_scene(**kw, texture_noise=1.0)
    np.testing.assert_array_equal(a.video, a2.video)  # determinism
    assert not np.array_equal(a.video, b.video)
    d = np.abs(a.video.astype(float) - b.video.astype(float)).max(-1)
    on = d > 0
    # High-contrast texture, not a subtle dither.
    assert np.percentile(d[on], 90) > 30, np.percentile(d[on], 90)
    np.testing.assert_array_equal(a.videodepth, b.videodepth)
    np.testing.assert_array_equal(a.trajectory_3d, b.trajectory_3d)
    np.testing.assert_array_equal(a.visibility, b.visibility)
