"""Softmax splatting (forward warping) — SpaTracker-variant parity op (L1).

The reference implements this as inline CUDA via cupy
(`mvtracker/models/core/spatracker/softsplat.py:288-450`: `softsplat_out`
forward kernel + custom autograd). On TPU the same computation is an XLA
scatter-add, which is differentiable for free (scatter-add's VJP is a
gather), so no custom kernel or VJP is needed:

    softsplat(tenIn, tenFlow, tenMetric, mode):
      each source pixel (x, y) is warped to (x + flow_x, y + flow_y) and
      bilinearly scattered into the output, weighted by exp(metric) for
      the "soft" mode; the output is normalized by the scattered weights.

Also provides `splat_points`, the point-cloud variant used by the
multi-view SpaTracker triplane construction
(`spatracker_multiview.py:595-615`): scatter world-space points' features
onto a regular 2D grid plane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_scatter(
    values: jax.Array,  # [B, P, C] weighted values to deposit
    weights: jax.Array,  # [B, P] deposit weights
    x: jax.Array,  # [B, P] continuous target x
    y: jax.Array,  # [B, P] continuous target y
    height: int,
    width: int,
) -> tuple[jax.Array, jax.Array]:
    """Scatter-add values*weights bilinearly into a [B, H, W, C] canvas.

    Returns (accumulated values [B, H, W, C], accumulated weights [B, H, W]).
    Out-of-range deposits are dropped (mode='drop'), matching the CUDA
    kernel's bounds checks.
    """
    b, p, c = values.shape
    # Non-finite positions are skipped entirely, like the CUDA kernel's
    # early return (`softsplat.py` kernels: `isfinite(fltX) == false`).
    # Without this, NaN's int32 cast can land IN bounds (it's 0 on XLA
    # CPU) and the NaN bilinear weight poisons that cell.
    finite = jnp.isfinite(x) & jnp.isfinite(y)
    x = jnp.where(finite, x, -2.0)
    y = jnp.where(finite, y, -2.0)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    acc = jnp.zeros((b, height, width, c), values.dtype)
    acc_w = jnp.zeros((b, height, width), values.dtype)

    for dx, dy in ((0, 0), (1, 0), (0, 1), (1, 1)):
        xi = (x0 + dx).astype(jnp.int32)
        yi = (y0 + dy).astype(jnp.int32)
        w_bil = (1 - jnp.abs(x - (x0 + dx))) * (1 - jnp.abs(y - (y0 + dy)))
        w_tot = w_bil * weights  # [B, P]
        in_bounds = finite & (xi >= 0) & (xi < width) & (yi >= 0) & (yi < height)
        w_tot = jnp.where(in_bounds, w_tot, 0.0)

        def scat(a, yy, xx, u):
            return a.at[yy, xx].add(u, mode="drop")

        acc = jax.vmap(scat)(acc, yi, xi, values * w_tot[..., None])
        acc_w = jax.vmap(scat)(acc_w, yi, xi, w_tot)
    return acc, acc_w


def softsplat(
    ten_in: jax.Array,  # [B, H, W, C] channels-last
    ten_flow: jax.Array,  # [B, H, W, 2] (dx, dy)
    ten_metric: jax.Array | None = None,  # [B, H, W]
    mode: str = "soft",
    eps: float = 1e-7,
) -> jax.Array:
    """Softmax splatting of an image through a flow field.

    Matches the semantics of reference `softsplat()`
    (`spatracker/softsplat.py:218-275`): mode in {"sum", "avg", "soft"};
    "soft" weights each source pixel by exp(metric) and normalizes.
    """
    b, h, w, c = ten_in.shape
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    tx = (xs[None] + ten_flow[..., 0]).reshape(b, h * w)
    ty = (ys[None] + ten_flow[..., 1]).reshape(b, h * w)
    values = ten_in.reshape(b, h * w, c)

    if mode == "sum":
        weights = jnp.ones((b, h * w), ten_in.dtype)
        acc, _ = _bilinear_scatter(values, weights, tx, ty, h, w)
        return acc
    if mode == "avg":
        weights = jnp.ones((b, h * w), ten_in.dtype)
        acc, acc_w = _bilinear_scatter(values, weights, tx, ty, h, w)
        return acc / (acc_w[..., None] + eps)
    if mode == "soft":
        assert ten_metric is not None
        weights = jnp.exp(ten_metric).reshape(b, h * w)
        acc, acc_w = _bilinear_scatter(values, weights, tx, ty, h, w)
        return acc / (acc_w[..., None] + eps)
    raise ValueError(f"unknown softsplat mode: {mode}")


def splat_points(
    points_xy: jax.Array,  # [B, P, 2] continuous plane coords
    features: jax.Array,  # [B, P, C]
    metric: jax.Array,  # [B, P] splatting weight logits
    height: int,
    width: int,
    eps: float = 1e-7,
) -> jax.Array:
    """Softmax-splat a point set onto a [H, W] feature plane.

    The point-cloud variant used for the triplane construction in the
    multi-view SpaTracker (`spatracker_multiview.py:595-615`).
    """
    weights = jnp.exp(metric)
    acc, acc_w = _bilinear_scatter(
        features, weights, points_xy[..., 0], points_xy[..., 1], height, width
    )
    return acc / (acc_w[..., None] + eps)
