"""Batched Gauss-Newton camera/track refinement with Schur elimination (L1).

The BASELINE north star poses camera-extrinsics + track refinement as "a
distributed Gauss-Newton solve with Schur-complement reduction over
collectives"; the reference has no comparable implementation (its camera
refinement is host-side Open3D ICP, `conversions/droid/utils/optimization.py`).
This module designs it fresh as a batched JAX solver:

Problem: given per-view pixel observations of N tracked points over T
frames (with visibility weights), refine world->camera extrinsics (one se3
twist per view) and the 3D points to minimize reprojection error:

    min_{xi_v, X_p} sum_{v,p} w_vp * || proj(K_v, exp(xi_v) E_v, X_p) - obs_vp ||^2

Structure exploited Gauss-Newton style:
- the point-block Hessian D is block-diagonal (3x3 per point) -> eliminate
  points via the Schur complement; solve the small reduced camera system
  (6V x 6V) densely; back-substitute points.
- every contraction is a batched einsum (MXU); damping = Levenberg.

Distribution: points shard over a mesh axis; the reduced camera system and
gradient are `psum`-reduced across shards (`refine_cameras_sharded`) — the
camera solve is tiny and replicated. This is the "Schur reduction over
collectives" pattern.

Observations here are per (view, point) at a fixed frame (static-camera
refinement, the common DROID case: static external cameras + robot tracks
aggregated over time). Per-frame extension = fold frames into the point
axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mvtracker_tpu.utils import geometry as geo


def _hat(w):
    """[..., 3] -> skew-symmetric [..., 3, 3]."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
        ],
        -2,
    )


def se3_exp(xi):
    """se(3) twist [..., 6] (rho, phi) -> [..., 4, 4] via exponential map."""
    rho, phi = xi[..., :3], xi[..., 3:]
    theta = jnp.linalg.norm(phi, axis=-1, keepdims=True)[..., None]
    k = _hat(phi)
    k2 = k @ k
    eye = jnp.broadcast_to(jnp.eye(3), k.shape)
    safe = jnp.maximum(theta, 1e-9)
    a = jnp.sin(safe) / safe
    b = (1 - jnp.cos(safe)) / safe**2
    c = (safe - jnp.sin(safe)) / safe**3
    small = theta[..., 0, 0] < 1e-6
    r = eye + jnp.where(small[..., None, None], 1.0, a) * k + jnp.where(
        small[..., None, None], 0.5, b
    ) * k2
    v = eye + jnp.where(small[..., None, None], 0.5, b) * k + jnp.where(
        small[..., None, None], 1.0 / 6.0, c
    ) * k2
    t = (v @ rho[..., None])[..., 0]
    top = jnp.concatenate([r, t[..., None]], -1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0]), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], -2)


def _project_residuals(intrs, extrs, points, obs, weights):
    """Reprojection residuals r [V, P, 2] and camera-space points."""
    pts_h = geo.to_homogeneous(points)  # [P, 4]
    cam = jnp.einsum("vij,pj->vpi", extrs, pts_h)  # [V, P, 3]
    z = jnp.maximum(cam[..., 2:], 1e-6)
    pix_h = jnp.einsum("vij,vpj->vpi", intrs, cam)
    pix = pix_h[..., :2] / jnp.maximum(pix_h[..., 2:], 1e-6)
    # sqrt(w) on the residual (and on the Jacobians below) so the normal
    # equations J^T J / J^T r carry weight w ONCE — the solver minimizes
    # sum_i w_i ||r_i||^2. Scaling both by w would square the weights.
    r = (pix - obs) * jnp.sqrt(weights)[..., None]
    return r, cam, z


def _jacobians(intrs, extrs, cam, z, weights):
    """J_cam [V,P,2,6] (d r / d twist) and J_pt [V,P,2,3] (d r / d X)."""
    fx = intrs[:, None, 0, 0, None]
    fy = intrs[:, None, 1, 1, None]
    x, y = cam[..., 0:1], cam[..., 1:2]
    inv_z = 1.0 / z
    # d(pix)/d(cam point) for K = [[fx,0,cx],[0,fy,cy]]:
    # du = fx/z dx - fx x/z^2 dz ; dv = fy/z dy - fy y/z^2 dz
    j_pc = jnp.stack(
        [
            jnp.concatenate([fx * inv_z, jnp.zeros_like(z), -fx * x * inv_z**2], -1),
            jnp.concatenate([jnp.zeros_like(z), fy * inv_z, -fy * y * inv_z**2], -1),
        ],
        -2,
    )  # [V, P, 2, 3]
    # cam point wrt twist (left-multiplied update): d cam / d xi = [I | -[cam]x]
    j_ct = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), cam.shape[:-1] + (3, 3)), -_hat(cam)], -1
    )  # [V, P, 3, 6]
    # cam point wrt world point: R_v
    w = jnp.sqrt(weights)[..., None, None]  # sqrt: see _project_residuals
    j_cam = (j_pc @ j_ct) * w  # [V, P, 2, 6]
    return j_cam, j_pc * w


def gauss_newton_step(intrs, extrs, points, obs, weights, damping=1e-4,
                      eliminate_points=True):
    """One damped GN step, optionally with Schur elimination of the points.

    With `eliminate_points` the step jointly solves cameras+points (points
    via back-substitution); without it, points are held FIXED and the
    camera system is solved per view (eliminating points while not applying
    their update is inconsistent and diverges).

    intrs [V,3,3], extrs [V,3,4], points [P,3], obs [V,P,2], weights [V,P].
    Returns (d_xi [V,6], d_points [P,3], mean_sq_residual scalar).
    """
    v, p = weights.shape
    r, cam, z = _project_residuals(intrs, extrs, points, obs, weights)
    j_cam, j_pc = _jacobians(intrs, extrs, cam, z, weights)
    rot = extrs[:, :, :3]  # [V, 3, 3]
    j_pt = jnp.einsum("vpij,vjk->vpik", j_pc, rot)  # [V, P, 2, 3]

    # Normal-equation blocks.
    a = jnp.einsum("vpiu,vpiw->vuw", j_cam, j_cam)  # per-view 6x6 -> [V,6,6]
    d = jnp.einsum("vpiu,vpiw->puw", j_pt, j_pt)  # per-point 3x3 -> [P,3,3]
    w_blk = jnp.einsum("vpiu,vpiw->vpuw", j_cam, j_pt)  # [V,P,6,3]
    g_cam = -jnp.einsum("vpiu,vpi->vu", j_cam, r)  # [V,6]
    g_pt = -jnp.einsum("vpiu,vpi->pu", j_pt, r)  # [P,3]

    msr = jnp.sum(r**2) / jnp.maximum(jnp.sum(weights), 1.0)

    if not eliminate_points:
        a_damped = a + damping * jnp.eye(6)[None]
        d_xi = jnp.linalg.solve(a_damped, g_cam[..., None])[..., 0]  # [V, 6]
        return d_xi, jnp.zeros_like(points), msr

    d = d + damping * jnp.eye(3)[None]
    d_inv = jnp.linalg.inv(d)  # [P,3,3]

    # Schur complement of the camera block:
    # S = blockdiag(A) - W D^-1 W^T (cross-view coupling through points).
    # The camera system is tiny (6V x 6V), so build it densely.
    wdi = jnp.einsum("vpuw,pwx->vpux", w_blk, d_inv)  # [V,P,6,3]
    s_full = jnp.einsum("vpux,wpyx->vwuy", wdi, w_blk)  # [V,V,6,6]
    a_full = jnp.zeros((v, v, 6, 6)).at[jnp.arange(v), jnp.arange(v)].set(
        a + damping * jnp.eye(6)[None]
    )
    s = (a_full - s_full).transpose(0, 2, 1, 3).reshape(6 * v, 6 * v)
    rhs = (g_cam - jnp.einsum("vpux,px->vu", wdi, g_pt)).reshape(6 * v)

    d_xi = jnp.linalg.solve(s, rhs).reshape(v, 6)
    d_points = jnp.einsum(
        "puw,pw->pu", d_inv, g_pt - jnp.einsum("vpuw,vu->pw", w_blk, d_xi)
    )
    return d_xi, d_points, msr


@functools.partial(jax.jit, static_argnames=("iterations", "refine_points"))
def refine_cameras(
    intrs,  # [V, 3, 3]
    extrs,  # [V, 3, 4] initial world->cam
    points,  # [P, 3] initial world points
    obs,  # [V, P, 2] pixel observations
    weights,  # [V, P] visibility/confidence weights
    iterations: int = 10,
    damping: float = 1e-4,
    refine_points: bool = True,
):
    """Jointly refine extrinsics (+ optionally points) by damped GN.

    Returns (extrs [V,3,4], points [P,3], final mean squared residual).
    """

    def body(carry, _):
        extrs_c, points_c = carry
        d_xi, d_pts, msr = gauss_newton_step(
            intrs, extrs_c, points_c, obs, weights, damping,
            eliminate_points=refine_points,
        )
        upd = se3_exp(d_xi)  # [V, 4, 4], left-multiplied update
        sq = geo.extrinsics_square(extrs_c)
        extrs_new = (upd @ sq)[:, :3, :]
        points_new = points_c + d_pts if refine_points else points_c
        return (extrs_new, points_new), msr

    (extrs_f, points_f), msrs = jax.lax.scan(
        body, (extrs, points), None, length=iterations
    )
    return extrs_f, points_f, msrs[-1]


def refine_cameras_sharded(
    intrs, extrs, points_local, obs_local, weights_local, axis_name: str,
    iterations: int = 10, damping: float = 1e-4,
):
    """Point-sharded GN camera refinement inside `shard_map`.

    Each device holds a shard of the points/observations; the reduced
    camera system (S, rhs) is psum-reduced — the Schur-complement-over-
    collectives pattern. Points are solved locally per shard.
    Cameras only (refine_points applies locally after the solve).
    """

    def body(carry, _):
        extrs_c, points_c = carry
        v = weights_local.shape[0]
        r, cam, z = _project_residuals(intrs, extrs_c, points_c, obs_local, weights_local)
        j_cam, j_pc = _jacobians(intrs, extrs_c, cam, z, weights_local)
        rot = extrs_c[:, :, :3]
        j_pt = jnp.einsum("vpij,vjk->vpik", j_pc, rot)

        a = jnp.einsum("vpiu,vpiw->vuw", j_cam, j_cam)
        d = jnp.einsum("vpiu,vpiw->puw", j_pt, j_pt) + damping * jnp.eye(3)[None]
        w_blk = jnp.einsum("vpiu,vpiw->vpuw", j_cam, j_pt)
        g_cam = -jnp.einsum("vpiu,vpi->vu", j_cam, r)
        g_pt = -jnp.einsum("vpiu,vpi->pu", j_pt, r)
        d_inv = jnp.linalg.inv(d)
        wdi = jnp.einsum("vpuw,pwx->vpux", w_blk, d_inv)
        s_full = jnp.einsum("vpux,wpyx->vwuy", wdi, w_blk)
        a_full = jnp.zeros((v, v, 6, 6)).at[jnp.arange(v), jnp.arange(v)].set(a)
        s_local = a_full - s_full
        rhs_local = g_cam - jnp.einsum("vpux,px->vu", wdi, g_pt)

        # Schur reduction over the point shards.
        s = jax.lax.psum(s_local, axis_name)
        rhs = jax.lax.psum(rhs_local, axis_name)
        s = s.at[jnp.arange(v), jnp.arange(v)].add(damping * jnp.eye(6)[None])
        s2 = s.transpose(0, 2, 1, 3).reshape(6 * v, 6 * v)
        d_xi = jnp.linalg.solve(s2, rhs.reshape(6 * v)).reshape(v, 6)

        d_pts = jnp.einsum(
            "puw,pw->pu", d_inv, g_pt - jnp.einsum("vpuw,vu->pw", w_blk, d_xi)
        )
        upd = se3_exp(d_xi)
        extrs_new = (upd @ geo.extrinsics_square(extrs_c))[:, :3, :]
        return (extrs_new, points_c + d_pts), jnp.sum(r**2)

    (extrs_f, points_f), _ = jax.lax.scan(
        body, (extrs, points_local), None, length=iterations
    )
    return extrs_f, points_f
