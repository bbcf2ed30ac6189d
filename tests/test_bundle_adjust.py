"""Gauss-Newton camera refinement tests: recover perturbed extrinsics from
reprojection observations (the BASELINE north-star solver)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.ops import bundle_adjust as ba
from mvtracker_tpu.utils import geometry as geo


def make_ba_problem(rng, v=3, p=200, noise_px=0.0):
    """Ground-truth cameras/points + pixel observations."""
    intrs = np.zeros((v, 3, 3), np.float32)
    intrs[:, 0, 0] = intrs[:, 1, 1] = 300.0
    intrs[:, 0, 2] = 160.0
    intrs[:, 1, 2] = 120.0
    intrs[:, 2, 2] = 1.0

    extrs = np.zeros((v, 3, 4), np.float32)
    for vi in range(v):
        theta = 2 * np.pi * vi / v
        c, s = np.cos(theta), np.sin(theta)
        look = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        extrs[vi, :, :3] = look
        extrs[vi, :, 3] = [0.05 * vi, -0.02 * vi, 3.0]

    points = rng.normal(size=(p, 3)).astype(np.float32) * 0.5

    import jax

    pix, z = jax.vmap(
        lambda i, e: geo.world_to_pixel_xy_and_camera_z(
            jnp.asarray(points)[None], jnp.asarray(i)[None], jnp.asarray(e)[None]
        )
    )(jnp.asarray(intrs), jnp.asarray(extrs))
    obs = np.array(pix)[:, 0]  # [V, P, 2]
    weights = (np.asarray(z)[:, 0, :, 0] > 0.1).astype(np.float32)
    obs += rng.normal(size=obs.shape).astype(np.float32) * noise_px
    return intrs, extrs, points, obs, weights


def perturb_extrinsics(extrs, rng, rot_deg=2.0, trans=0.05):
    out = extrs.copy()
    for vi in range(1, len(extrs)):  # keep view 0 as gauge anchor
        angle = np.deg2rad(rot_deg) * rng.normal(size=3)
        from scipy.spatial.transform import Rotation as R

        dr = R.from_rotvec(angle).as_matrix().astype(np.float32)
        out[vi, :, :3] = dr @ out[vi, :, :3]
        out[vi, :, 3] += trans * rng.normal(size=3).astype(np.float32)
    return out


def test_se3_exp_identity_and_translation():
    np.testing.assert_allclose(np.asarray(ba.se3_exp(jnp.zeros(6))), np.eye(4), atol=1e-7)
    t = np.asarray(ba.se3_exp(jnp.asarray([1.0, 2.0, 3.0, 0, 0, 0])))
    np.testing.assert_allclose(t[:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(t[:3, :3], np.eye(3), atol=1e-6)
    # Pure rotation about z by pi/2.
    r = np.asarray(ba.se3_exp(jnp.asarray([0, 0, 0, 0, 0, np.pi / 2])))
    np.testing.assert_allclose(r[:3, :3], [[0, -1, 0], [1, 0, 0], [0, 0, 1]], atol=1e-6)


def test_refine_recovers_perturbed_cameras(rng):
    intrs, extrs_gt, points, obs, weights = make_ba_problem(rng)
    extrs0 = perturb_extrinsics(extrs_gt, rng)

    extrs_ref, points_ref, msr = ba.refine_cameras(
        jnp.asarray(intrs), jnp.asarray(extrs0), jnp.asarray(points),
        jnp.asarray(obs), jnp.asarray(weights),
        iterations=15, refine_points=False,
    )
    # Residual collapses by orders of magnitude.
    r0, _, _ = ba._project_residuals(
        jnp.asarray(intrs), jnp.asarray(extrs0), jnp.asarray(points),
        jnp.asarray(obs), jnp.asarray(weights),
    )
    msr0 = float(jnp.mean(r0**2))
    assert float(msr) < msr0 * 1e-3, (float(msr), msr0)
    # Recovered extrinsics close to GT.
    np.testing.assert_allclose(np.asarray(extrs_ref), extrs_gt, atol=5e-3)


def test_refine_joint_points_and_cameras(rng):
    intrs, extrs_gt, points_gt, obs, weights = make_ba_problem(rng)
    extrs0 = perturb_extrinsics(extrs_gt, rng, rot_deg=1.0, trans=0.02)
    points0 = points_gt + rng.normal(size=points_gt.shape).astype(np.float32) * 0.02

    extrs_ref, points_ref, msr = ba.refine_cameras(
        jnp.asarray(intrs), jnp.asarray(extrs0), jnp.asarray(points0),
        jnp.asarray(obs), jnp.asarray(weights), iterations=20,
    )
    assert float(msr) < 1e-4


def test_refine_sharded_matches_dense(rng):
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    intrs, extrs_gt, points, obs, weights = make_ba_problem(rng, p=256)
    extrs0 = perturb_extrinsics(extrs_gt, rng, rot_deg=1.0, trans=0.02)

    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("pt",))
    f = shard_map(
        lambda pts, o, w: ba.refine_cameras_sharded(
            jnp.asarray(intrs), jnp.asarray(extrs0), pts, o, w, "pt", iterations=10
        ),
        mesh=mesh,
        in_specs=(P("pt"), P(None, "pt"), P(None, "pt")),
        out_specs=(P(None, None), P("pt")),
        check_vma=False,
    )
    extrs_sh, points_sh = f(jnp.asarray(points), jnp.asarray(obs), jnp.asarray(weights))
    extrs_dense, points_dense, msr_dense = ba.refine_cameras(
        jnp.asarray(intrs), jnp.asarray(extrs0), jnp.asarray(points),
        jnp.asarray(obs), jnp.asarray(weights), iterations=10,
    )
    # Joint refinement has a sim3 gauge freedom, so raw extrinsics can
    # differ between solvers; compare the OBJECTIVE instead: both must
    # collapse the reprojection residual to (near) zero.
    r_sh, _, _ = ba._project_residuals(
        jnp.asarray(intrs), extrs_sh, points_sh, jnp.asarray(obs), jnp.asarray(weights)
    )
    r0, _, _ = ba._project_residuals(
        jnp.asarray(intrs), jnp.asarray(extrs0), jnp.asarray(points),
        jnp.asarray(obs), jnp.asarray(weights),
    )
    msr_sh = float(jnp.mean(r_sh**2))
    msr0 = float(jnp.mean(r0**2))
    assert msr_sh < msr0 * 1e-4, (msr_sh, msr0)
    assert float(msr_dense) < msr0 * 1e-4


def test_weights_are_linear_not_squared(rng):
    """A weight-2 observation must act exactly like TWO weight-1 duplicates
    (the solver minimizes sum w * ||r||^2; scaling residual AND Jacobian by
    w rather than sqrt(w) would make it w^2)."""
    import jax.numpy as jnp

    from mvtracker_tpu.ops.bundle_adjust import gauss_newton_step

    intrs, extrs, points, obs, weights = make_ba_problem(rng)
    obs = obs + rng.normal(size=obs.shape).astype(np.float32) * 2.0  # nonzero residuals
    weights = np.where(weights > 0, 1.0, 0.0).astype(np.float32)
    # Double the weight of the first half of the points...
    w2 = weights.copy()
    half = points.shape[0] // 2
    w2[:, :half] *= 2.0
    d_xi_weighted, _, _ = gauss_newton_step(
        jnp.asarray(intrs), jnp.asarray(extrs), jnp.asarray(points),
        jnp.asarray(obs), jnp.asarray(w2), eliminate_points=False,
    )
    # ...versus physically duplicating those observations at weight 1.
    points_dup = np.concatenate([points, points[:half]], axis=0)
    obs_dup = np.concatenate([obs, obs[:, :half]], axis=1)
    w_dup = np.concatenate([weights, weights[:, :half]], axis=1)
    d_xi_dup, _, _ = gauss_newton_step(
        jnp.asarray(intrs), jnp.asarray(extrs), jnp.asarray(points_dup),
        jnp.asarray(obs_dup), jnp.asarray(w_dup), eliminate_points=False,
    )
    np.testing.assert_allclose(
        np.asarray(d_xi_weighted), np.asarray(d_xi_dup), rtol=1e-4, atol=1e-6
    )
