"""Batched point-cloud registration: ICP + wrist-camera z-offset search.

TPU-native re-design of the reference DROID camera refinement
(`/root/reference/conversions/droid/utils/optimization.py`):

- `run_icp_point_to_plane` / `run_icp_point_to_point` (:165-237): Open3D
  ICP -> here a jitted fixed-iteration ICP with static shapes. Nearest
  neighbors come from `ops.knn` (the same kernel the tracker uses),
  correspondences beyond `max_corr_dist` are soft-rejected by weight, the
  point-to-plane step solves the damped 6x6 normal equations of the
  linearized SE(3) residual, and point-to-point uses the weighted Kabsch
  solution. Fitness = inlier fraction, matching Open3D's definition.
- `compute_alignment_error_for_z_offset` / `optimize_wrist_z_offset[_multi
  _frame]` (:239-391): scipy bounded scalar search over the wrist-camera
  z offset -> here a jitted fitness evaluated over a candidate grid (one
  compile, every candidate scored with the SAME static graph; vmap over
  candidates batches the ICP runs onto the MXU) followed by a parabolic
  refinement around the best grid cell.
- `apply_z_offset_to_wrist_transforms` (:394-424): offset along the camera
  z axis -> `apply_z_offset_to_extrinsics` for the repo's world->camera
  [3, 4] convention.

Everything is pure JAX (CPU or TPU); orchestration that touches files and
per-episode config lives in `droid/refine.py`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from mvtracker_tpu.ops import knn as knn_ops


def estimate_normals(points: jax.Array, k: int = 16) -> jax.Array:
    """Per-point normals from the k-neighborhood covariance.

    Mirrors Open3D `estimate_normals` (reference `optimization.py:120`):
    the smallest-eigenvector of the local covariance. Orientation is made
    deterministic (positive z hemisphere); point-to-plane residuals are
    sign-invariant so orientation does not matter downstream.

    points: [P, 3] -> [P, 3] unit normals.
    """
    p = points.shape[0]
    kk = min(k, p)
    _, idx = knn_ops.knn(points[None], points[None], kk)  # [1, P, kk]
    nbrs = points[idx[0]]  # [P, kk, 3]
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = jnp.einsum("pki,pkj->pij", centered, centered)  # [P, 3, 3]
    # eigh returns ascending eigenvalues; the smallest's vector is the normal.
    _, vecs = jnp.linalg.eigh(cov)
    n = vecs[..., 0]
    sign = jnp.where(n[..., 2:3] < 0, -1.0, 1.0)
    return n * sign


def _so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: so(3) vector [3] -> rotation matrix [3, 3]."""
    theta = jnp.linalg.norm(w) + 1e-12
    k = w / theta
    kx = jnp.array(
        [[0.0, -k[2], k[1]], [k[2], 0.0, -k[0]], [-k[1], k[0], 0.0]]
    )
    return (
        jnp.eye(3)
        + jnp.sin(theta) * kx
        + (1.0 - jnp.cos(theta)) * (kx @ kx)
    )


@partial(jax.jit, static_argnames=("iters", "point_to_plane"))
def icp(
    source: jax.Array,  # [N, 3]
    target: jax.Array,  # [P, 3]
    target_normals: jax.Array | None = None,  # [P, 3] (point-to-plane)
    max_corr_dist: float = 0.05,
    iters: int = 20,
    point_to_plane: bool = True,
    damping: float = 1e-6,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Rigid ICP aligning `source` onto `target`.

    Returns (R [3,3], t [3], fitness scalar) with fitness = final inlier
    fraction (correspondences within max_corr_dist), Open3D's definition
    (reference `optimization.py:196` consumes `result.fitness`).
    """
    if point_to_plane and target_normals is None:
        target_normals = estimate_normals(target)

    def step(carry, _):
        r, t = carry
        src = source @ r.T + t  # [N, 3]
        d, idx = knn_ops.knn(target[None], src[None], 1)
        idx = idx[0, :, 0]  # [N]
        dist = d[0, :, 0]
        w = (dist < max_corr_dist).astype(jnp.float32)  # [N]
        tgt = target[idx]  # [N, 3]
        if point_to_plane:
            nrm = target_normals[idx]  # [N, 3]
            resid = jnp.einsum("ni,ni->n", src - tgt, nrm)  # [N]
            # d(resid)/d(w, dt) with src' = src + w x src + dt:
            a = jnp.concatenate([jnp.cross(src, nrm), nrm], axis=1)  # [N, 6]
            ata = jnp.einsum("ni,nj,n->ij", a, a, w) + damping * jnp.eye(6)
            atb = -jnp.einsum("ni,n,n->i", a, resid, w)
            x = jnp.linalg.solve(ata, atb)
            dr = _so3_exp(x[:3])
            dt = x[3:]
            r_new = dr @ r
            t_new = dr @ t + dt
        else:
            # Weighted Kabsch (no scale): reference point-to-point ICP.
            wsum = jnp.maximum(w.sum(), 1.0)
            mu_s = (src * w[:, None]).sum(0) / wsum
            mu_t = (tgt * w[:, None]).sum(0) / wsum
            h = jnp.einsum("ni,nj,n->ij", src - mu_s, tgt - mu_t, w)
            u, _, vt = jnp.linalg.svd(h)
            d_sign = jnp.sign(jnp.linalg.det(vt.T @ u.T))
            dcorr = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d_sign]))
            dr = vt.T @ dcorr @ u.T
            dt = mu_t - dr @ mu_s
            r_new = dr @ r
            t_new = dr @ t + dt
        return (r_new, t_new), w.mean()

    (r, t), fits = jax.lax.scan(
        step, (jnp.eye(3), jnp.zeros(3)), None, length=iters
    )
    return r, t, fits[-1]


@partial(jax.jit, static_argnames=("icp_iters",))
def z_offset_fitness(
    z_offsets: jax.Array,  # [C] candidate offsets
    wrist_points_local: jax.Array,  # [N, 3] camera-frame points
    wrist_cam_to_world: jax.Array,  # [4, 4]
    external_points_world: jax.Array,  # [P, 3]
    external_normals: jax.Array,  # [P, 3]
    max_corr_dist: float = 0.05,
    icp_iters: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Alignment quality per z-offset candidate (vmapped; one compile).

    Counterpart of `compute_alignment_error_for_z_offset` (reference
    `optimization.py:239-302`), with one deliberate fix: the reference
    scores each candidate by the fitness AFTER a full ICP — but the z
    shift is a rigid translation that ICP simply undoes, so its objective
    is a plateau (any candidate within the correspondence radius converges
    to the same aligned fitness) and the recovered offset is only
    corr-dist-coarse. Here the default (icp_iters=0) scores the shifted
    cloud IN PLACE: inlier fraction and inlier-weighted mean point-to-plane
    |residual| against the external cloud. The residual falls linearly to
    ~0 exactly at the true offset, making the optimum sharp (sub-mm with
    the golden-section refinement in the callers). icp_iters > 0
    reproduces the reference's post-ICP behavior (useful when the other
    extrinsic DoF are themselves unreliable).

    Returns (fitness [C], mean_abs_residual [C]).
    """

    def one(z):
        shifted = wrist_points_local + jnp.array([0.0, 0.0, 1.0]) * z
        world = shifted @ wrist_cam_to_world[:3, :3].T + wrist_cam_to_world[:3, 3]
        if icp_iters > 0:
            r, t, _ = icp(
                world,
                external_points_world,
                external_normals,
                max_corr_dist=max_corr_dist,
                iters=icp_iters,
                point_to_plane=True,
            )
            world = world @ r.T + t
        d, idx = knn_ops.knn(external_points_world[None], world[None], 1)
        nn_i = idx[0, :, 0]
        w = (d[0, :, 0] < max_corr_dist).astype(jnp.float32)
        resid = jnp.abs(
            jnp.einsum(
                "ni,ni->n",
                world - external_points_world[nn_i],
                external_normals[nn_i],
            )
        )
        wsum = jnp.maximum(w.sum(), 1.0)
        return w.mean(), (resid * w).sum() / wsum

    return jax.vmap(one)(z_offsets)


def optimize_wrist_z_offset(
    wrist_points_local,  # [N, 3]
    wrist_cam_to_world,  # [4, 4]
    external_points_world,  # [P, 3]
    z_range: tuple[float, float] = (-0.05, 0.05),
    n_grid: int = 21,
    max_corr_dist: float = 0.05,
    icp_iters: int = 0,
    refine_tol: float = 1e-5,
) -> tuple[float, float]:
    """Single-frame z-offset search (reference `optimize_wrist_z_offset`,
    `optimization.py:304-339`). Coarse grid + golden-section refinement of
    the residual objective instead of scipy's bounded Brent; every
    candidate batch is one compiled device program.

    Returns (optimal_z, best_fitness)."""
    return optimize_wrist_z_offset_multi_frame(
        [
            {
                "wrist_points_local": wrist_points_local,
                "wrist_cam_to_world": wrist_cam_to_world,
                "external_points_world": external_points_world,
            }
        ],
        z_range=z_range,
        n_grid=n_grid,
        max_corr_dist=max_corr_dist,
        icp_iters=icp_iters,
        refine_tol=refine_tol,
    )


def optimize_wrist_z_offset_multi_frame(
    frames_data: list[dict],
    z_range: tuple[float, float] = (-0.05, 0.05),
    n_grid: int = 21,
    max_corr_dist: float = 0.05,
    icp_iters: int = 0,
    refine_tol: float = 1e-5,
) -> tuple[float, float]:
    """Multi-frame z-offset search (reference
    `optimize_wrist_z_offset_multi_frame`, `optimization.py:342-391`):
    the objective is averaged across frames, under-populated frames are
    skipped like the reference's `< 100` point guard (:264).

    Objective: inlier-weighted mean point-to-plane |residual| (see
    `z_offset_fitness` — minimized), gated to candidates with a usable
    inlier fraction. Coarse grid localizes the global basin; golden-section
    then refines to `refine_tol` (default 10 um, well under the 1 mm
    done-criterion).

    frames_data: dicts with `wrist_points_local` [N,3],
    `wrist_cam_to_world` [4,4] (or `wrist_transform`, the reference's
    key), `external_points_world` [P,3]. Returns (optimal_z, avg_fitness).
    """
    import numpy as np

    frames = []
    for frame in frames_data:
        wl = jnp.asarray(frame["wrist_points_local"], jnp.float32)
        c2w = jnp.asarray(
            frame.get("wrist_cam_to_world", frame.get("wrist_transform")),
            jnp.float32,
        )
        ext = jnp.asarray(frame["external_points_world"], jnp.float32)
        if wl.shape[0] < 100 or ext.shape[0] < 100:
            continue  # reference skips under-populated frames (:264)
        frames.append((wl, c2w, ext, estimate_normals(ext)))
    if not frames:
        return 0.0, 0.0

    def objective(zs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        zs_j = jnp.asarray(zs, jnp.float32)
        fit_sum = np.zeros(len(zs))
        res_sum = np.zeros(len(zs))
        for wl, c2w, ext, nrm in frames:
            f, r = z_offset_fitness(
                zs_j, wl, c2w, ext, nrm,
                max_corr_dist=max_corr_dist, icp_iters=icp_iters,
            )
            fit_sum += np.asarray(f)
            res_sum += np.asarray(r)
        fit = fit_sum / len(frames)
        res = res_sum / len(frames)
        # Candidates with almost no inliers carry no geometric signal.
        return fit, np.where(fit > 0.05, res, np.inf)

    zs = np.linspace(z_range[0], z_range[1], n_grid)
    fit, res = objective(zs)
    i = int(np.argmin(res))
    if not np.isfinite(res[i]):
        return 0.0, 0.0
    # Golden-section refinement inside the bracketing grid cells. The
    # candidate count per call varies (2), but z_offset_fitness is traced
    # over a [C]-shaped array, so C=2 is one extra compile at most.
    lo = zs[max(i - 1, 0)]
    hi = zs[min(i + 1, n_grid - 1)]
    inv_phi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = lo, hi
    c = b - inv_phi * (b - a)
    d = a + inv_phi * (b - a)
    fc = objective(np.array([c]))[1][0]
    fd = objective(np.array([d]))[1][0]
    while b - a > refine_tol:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - inv_phi * (b - a)
            fc = objective(np.array([c]))[1][0]
        else:
            a, c, fc = c, d, fd
            d = a + inv_phi * (b - a)
            fd = objective(np.array([d]))[1][0]
    z_best = float((a + b) / 2)
    f_best = float(objective(np.array([z_best]))[0][0])
    return z_best, f_best


def apply_z_offset_to_extrinsics(extrs, z_offset: float):
    """Shift camera centers along each camera's z (viewing) axis.

    Our extrinsics are world->camera [..., 3, 4] (x_cam = R x_world + t);
    the reference stores camera->world 4x4 and adds `z_offset * T[:3, 2]`
    to the translation (`optimization.py:394-424`). Equivalent here: the
    camera center c = -R^T t moves to c' = c + z_offset * (R^T e_z), so
    t' = -R c' = t - z_offset * e_z — subtract z_offset from t's z
    component.
    """
    extrs = jnp.asarray(extrs)
    delta = jnp.zeros_like(extrs[..., 3])
    delta = delta.at[..., 2].set(z_offset)
    return extrs.at[..., 3].set(extrs[..., 3] - delta)
