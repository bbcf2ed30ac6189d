"""Differentiable 3D gaussian splatting, TPU-native.

Reference counterparts (both external CUDA libraries in the reference):
- ``diff_gaussian_rasterization`` used by Dynamic3DGS
  (reference ``mvtracker/models/core/dynamic3dgs/train.py:9``).
- ``gsplat.rendering.rasterization`` used by Shape-of-Motion
  (reference ``mvtracker/models/core/shape-of-motion/flow3d/scene_model.py:5``).

TPU-first design. The CUDA rasterizers build per-16x16-tile depth-sorted
gaussian lists with atomics and dynamic per-tile counts — none of which maps
to XLA. Instead we keep every shape static:

1. Project all N gaussians once (EWA splatting: perspective Jacobian applied
   to the 3D covariance, +0.3 px low-pass as in the reference rasterizers).
2. Depth-sort the gaussians globally with one XLA sort per frame (invalid /
   behind-camera gaussians get depth=+inf so they sink to the back and
   contribute alpha=0).
3. ``lax.scan`` front-to-back over fixed-size gaussian chunks, carrying
   per-pixel transmittance. Within a chunk, exact compositing order is
   preserved with an exclusive cumulative product of (1 - alpha) along the
   chunk axis. Peak memory is O(HW * chunk) instead of O(HW * N), and every
   op is a dense VPU-friendly elementwise/broadcast op.

This is exact (not an approximation of) front-to-back alpha compositing, and
JAX autodiff through the scan gives the backward pass for free — no custom
``softsplat_ingrad``-style adjoint kernel is needed.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# Alpha below this contributes nothing (mirror of the CUDA rasterizers'
# 1/255 cutoff); also used to clamp alpha away from 1 for stable cumprod.
_ALPHA_EPS = 1.0 / 255.0
_ALPHA_MAX = 0.999


def quat_to_rotmat(q: jax.Array) -> jax.Array:
    """Unit-normalize wxyz quaternion(s) [..., 4] -> rotation matrix [..., 3, 3]."""
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of wxyz quaternions (reference dynamic3dgs
    ``helpers.py::quat_mult``)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def cont6d_to_rotmat(c: jax.Array) -> jax.Array:
    """Continuous 6D rotation parameterization [..., 6] -> [..., 3, 3]
    (Gram-Schmidt on two column vectors; reference shape-of-motion
    ``flow3d/transforms.py::cont_6d_to_rmat``)."""
    a1, a2 = c[..., :3], c[..., 3:]
    b1 = a1 / jnp.clip(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-8)
    a2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2 / jnp.clip(jnp.linalg.norm(a2, axis=-1, keepdims=True), 1e-8)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def rotmat_to_cont6d(r: jax.Array) -> jax.Array:
    """Inverse of :func:`cont6d_to_rotmat` (first two columns)."""
    return jnp.concatenate([r[..., :, 0], r[..., :, 1]], axis=-1)


def build_cov3d(log_scales: jax.Array, quats: jax.Array) -> jax.Array:
    """Per-gaussian world covariance R S S^T R^T; scales are exp(log_scales)."""
    r = quat_to_rotmat(quats)
    s = jnp.exp(log_scales)
    rs = r * s[..., None, :]
    return rs @ jnp.swapaxes(rs, -1, -2)


class ProjectedGaussians(NamedTuple):
    """Screen-space gaussians, ready for rasterization."""

    means2d: jax.Array  # [N, 2] pixel coords
    conic: jax.Array  # [N, 3] upper-tri of inverse 2D covariance (a, b, c)
    depths: jax.Array  # [N] camera z (+inf if invalid)
    opacities: jax.Array  # [N] in [0, 1], zeroed if invalid
    radii: jax.Array  # [N] 3-sigma screen radius in px (0 if invalid)


def project_gaussians(
    means3d: jax.Array,
    cov3d: jax.Array,
    opacities: jax.Array,
    intr: jax.Array,
    w2c: jax.Array,
    img_wh: tuple[int, int],
    near: float = 0.01,
    far: float = 1e4,
) -> ProjectedGaussians:
    """EWA-project 3D gaussians into a pinhole camera.

    means3d [N,3], cov3d [N,3,3], opacities [N], intr [3,3], w2c [3,4] or [4,4].
    """
    w, h = img_wh
    rot, tr = w2c[:3, :3], w2c[:3, 3]
    p_cam = means3d @ rot.T + tr  # [N, 3]
    z = p_cam[..., 2]
    fx, fy, cx, cy = intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2]

    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    means2d = jnp.stack(
        [fx * p_cam[..., 0] / z_safe + cx, fy * p_cam[..., 1] / z_safe + cy], axis=-1
    )

    # EWA: J @ W @ Sigma @ W^T @ J^T with the perspective Jacobian J.
    # (Same math as diff-gaussian-rasterization's computeCov2D.)
    x, y = p_cam[..., 0], p_cam[..., 1]
    # Clamp the frustum-tangent terms like the CUDA kernel does (1.3 * fov).
    lim_x = 1.3 * (0.5 * w / fx)
    lim_y = 1.3 * (0.5 * h / fy)
    tx = jnp.clip(x / z_safe, -lim_x, lim_x) * z_safe
    ty = jnp.clip(y / z_safe, -lim_y, lim_y) * z_safe
    zero = jnp.zeros_like(z_safe)
    j = jnp.stack(
        [
            jnp.stack([fx / z_safe, zero, -fx * tx / (z_safe * z_safe)], -1),
            jnp.stack([zero, fy / z_safe, -fy * ty / (z_safe * z_safe)], -1),
        ],
        axis=-2,
    )  # [N, 2, 3]
    jw = j @ rot  # [N, 2, 3]
    cov2d = jw @ cov3d @ jnp.swapaxes(jw, -1, -2)  # [N, 2, 2]
    # Low-pass: ensure each splat covers >= ~1 px (the reference adds 0.3).
    cov2d = cov2d + 0.3 * jnp.eye(2, dtype=cov2d.dtype)

    a, b, c = cov2d[..., 0, 0], cov2d[..., 0, 1], cov2d[..., 1, 1]
    det = a * c - b * b
    det_safe = jnp.where(det <= 0, 1.0, det)
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    mid = 0.5 * (a + c)
    lam_max = mid + jnp.sqrt(jnp.clip(mid * mid - det, 0.1))
    radii = jnp.ceil(3.0 * jnp.sqrt(lam_max))

    on_screen = (
        (means2d[..., 0] > -radii)
        & (means2d[..., 0] < w + radii)
        & (means2d[..., 1] > -radii)
        & (means2d[..., 1] < h + radii)
    )
    valid = (z > near) & (z < far) & (det > 0) & on_screen
    return ProjectedGaussians(
        means2d=means2d,
        conic=conic,
        depths=jnp.where(valid, z, jnp.inf),
        opacities=jnp.where(valid, opacities, 0.0),
        radii=jnp.where(valid, radii, 0.0),
    )


def _composite_chunked(
    means2d: jax.Array,
    conic: jax.Array,
    depths: jax.Array,
    opacities: jax.Array,
    attrs: jax.Array,
    img_wh: tuple[int, int],
    chunk: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Front-to-back compositing of depth-sorted gaussians over pixel grid.

    attrs [N, A] are per-gaussian attributes to composite (rgb, etc.).
    Returns (attr image [H*W, A], alpha [H*W], expected depth [H*W]).
    """
    w, h = img_wh
    n = means2d.shape[0]
    pad = (-n) % chunk
    if pad:
        means2d = jnp.pad(means2d, ((0, pad), (0, 0)))
        conic = jnp.pad(conic, ((0, pad), (0, 0)))
        depths = jnp.pad(depths, ((0, pad),), constant_values=jnp.inf)
        opacities = jnp.pad(opacities, ((0, pad),))
        attrs = jnp.pad(attrs, ((0, pad), (0, 0)))
    n_chunks = (n + pad) // chunk

    ys, xs = jnp.mgrid[0:h, 0:w]
    # Pixel centers at integer coords (repo convention — see
    # ``utils/geometry.py::pixel_grid`` at stride 1).
    px = xs.reshape(-1).astype(means2d.dtype)  # [HW]
    py = ys.reshape(-1).astype(means2d.dtype)

    def body(carry, inputs):
        trans, acc_attr, acc_depth = carry
        m2d, con, dep, opa, att = inputs
        dx = px[None, :] - m2d[:, 0:1]  # [chunk, HW]
        dy = py[None, :] - m2d[:, 1:2]
        power = -0.5 * (con[:, 0:1] * dx * dx + con[:, 2:3] * dy * dy) - con[:, 1:2] * dx * dy
        alpha = opa[:, None] * jnp.exp(jnp.minimum(power, 0.0))
        alpha = jnp.clip(alpha, 0.0, _ALPHA_MAX)
        alpha = jnp.where(alpha < _ALPHA_EPS, 0.0, alpha)
        one_minus = 1.0 - alpha  # [chunk, HW]
        # Exclusive cumulative product preserves in-chunk compositing order.
        cum = jnp.cumprod(one_minus, axis=0)
        excl = jnp.concatenate([jnp.ones_like(cum[:1]), cum[:-1]], axis=0)
        wgt = alpha * excl * trans[None, :]  # [chunk, HW]
        acc_attr = acc_attr + wgt.T @ att  # [HW, A]
        dep_finite = jnp.where(jnp.isfinite(dep), dep, 0.0)
        acc_depth = acc_depth + wgt.T @ dep_finite[:, None]
        trans = trans * cum[-1]
        return (trans, acc_attr, acc_depth), None

    hw = h * w
    a_dim = attrs.shape[-1]
    init = (
        jnp.ones((hw,), means2d.dtype),
        jnp.zeros((hw, a_dim), means2d.dtype),
        jnp.zeros((hw, 1), means2d.dtype),
    )
    seq = (
        means2d.reshape(n_chunks, chunk, 2),
        conic.reshape(n_chunks, chunk, 3),
        depths.reshape(n_chunks, chunk),
        opacities.reshape(n_chunks, chunk),
        attrs.reshape(n_chunks, chunk, a_dim),
    )
    (trans, acc_attr, acc_depth), _ = lax.scan(
        jax.checkpoint(body), init, seq
    )
    alpha = 1.0 - trans
    return acc_attr, alpha, acc_depth[:, 0]


class RenderOutput(NamedTuple):
    rgb: jax.Array  # [H, W, A]
    alpha: jax.Array  # [H, W]
    depth: jax.Array  # [H, W] alpha-weighted expected depth
    radii: jax.Array  # [N] screen radii (0 for culled) — densification stats
    means2d: jax.Array  # [N, 2] projected centers — densification grad hook


@partial(jax.jit, static_argnames=("img_wh", "chunk"))
def render_gaussians(
    means3d: jax.Array,
    quats: jax.Array,
    log_scales: jax.Array,
    logit_opacities: jax.Array,
    colors: jax.Array,
    intr: jax.Array,
    w2c: jax.Array,
    img_wh: tuple[int, int],
    bg: jax.Array | None = None,
    chunk: int = 512,
    means2d_offset: jax.Array | None = None,
) -> RenderOutput:
    """Render N gaussians into one pinhole view. colors [N, A] for any A.

    Differentiable in every gaussian parameter. Pass a zeros [N, 2]
    ``means2d_offset`` and differentiate w.r.t. it to obtain screen-space
    center gradients — the densification statistic the reference accumulates
    via ``means2D.retain_grad()`` (dynamic3dgs ``train.py:88``).
    """
    w, h = img_wh
    cov3d = build_cov3d(log_scales, quats)
    opac = jax.nn.sigmoid(logit_opacities.reshape(-1))
    proj = project_gaussians(means3d, cov3d, opac, intr, w2c, (w, h))
    means2d = proj.means2d
    if means2d_offset is not None:
        means2d = means2d + means2d_offset

    order = jnp.argsort(proj.depths)
    attr = colors.astype(means3d.dtype)
    acc, alpha, depth = _composite_chunked(
        means2d[order],
        proj.conic[order],
        proj.depths[order],
        proj.opacities[order],
        attr[order],
        (w, h),
        chunk,
    )
    if bg is not None:
        acc = acc + (1.0 - alpha)[:, None] * bg[None, :]
    return RenderOutput(
        rgb=acc.reshape(h, w, -1),
        alpha=alpha.reshape(h, w),
        depth=depth.reshape(h, w),
        radii=proj.radii,
        means2d=proj.means2d,
    )


def render_reference(
    means3d, quats, log_scales, logit_opacities, colors, intr, w2c, img_wh, bg=None
):
    """O(HW*N) unchunked renderer for correctness tests (per-pixel loop over
    all gaussians in one shot). Semantically identical to
    :func:`render_gaussians`."""
    return render_gaussians(
        means3d, quats, log_scales, logit_opacities, colors, intr, w2c, img_wh,
        bg=bg, chunk=max(1, means3d.shape[0]),
    )


def ssim(img0: jax.Array, img1: jax.Array, window: int = 11, sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over an [H, W, C] image pair (gaussian-windowed, the same
    formulation as dynamic3dgs ``external.py::calc_ssim``)."""
    half = window // 2
    coords = jnp.arange(window, dtype=img0.dtype) - half
    g = jnp.exp(-(coords**2) / (2 * sigma**2))
    g = g / g.sum()

    def blur(x):  # separable gaussian filter, per channel
        x = jnp.moveaxis(x, -1, 0)[:, None]  # [C, 1, H, W]
        kh = g.reshape(1, 1, window, 1)
        kw = g.reshape(1, 1, 1, window)
        x = lax.conv_general_dilated(x, kh, (1, 1), "VALID")
        x = lax.conv_general_dilated(x, kw, (1, 1), "VALID")
        return jnp.moveaxis(x[:, 0], 0, -1)

    c1, c2 = 0.01**2, 0.03**2
    mu0, mu1 = blur(img0), blur(img1)
    var0 = blur(img0 * img0) - mu0 * mu0
    var1 = blur(img1 * img1) - mu1 * mu1
    cov = blur(img0 * img1) - mu0 * mu1
    num = (2 * mu0 * mu1 + c1) * (2 * cov + c2)
    den = (mu0 * mu0 + mu1 * mu1 + c1) * (var0 + var1 + c2)
    return jnp.mean(num / den)


def gaussian_influence(
    points: jax.Array,
    means3d: jax.Array,
    quats: jax.Array,
    log_scales: jax.Array,
    logit_opacities: jax.Array,
) -> jax.Array:
    """Opacity-weighted gaussian density of each gaussian at each query point:
    ``sigmoid(o) * exp(-1/2 (x-mu)^T Sigma^-1 (x-mu))`` -> [M, N].

    Vectorized form of dynamic3dgs ``track_3d.py::gaussian_influence``
    (which inverts per-gaussian covariances); we solve in the gaussian's
    eigenbasis instead: Sigma^-1 = R S^-2 R^T.
    """
    r = quat_to_rotmat(quats)  # [N, 3, 3]
    inv_s = jnp.exp(-log_scales)  # [N, 3]
    diff = points[:, None, :] - means3d[None, :, :]  # [M, N, 3]
    local = jnp.einsum("nij,mni->mnj", r, diff)  # rotate into gaussian frame
    maha = jnp.sum((local * inv_s[None]) ** 2, axis=-1)
    return jax.nn.sigmoid(logit_opacities.reshape(-1))[None, :] * jnp.exp(-0.5 * maha)
