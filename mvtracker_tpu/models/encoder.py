"""Convolutional feature encoder (L2), channels-last NHWC for TPU.

A TPU-first re-implementation of the reference's `BasicEncoder`
(`mvtracker/models/core/spatracker/blocks.py:130-284`): stride-2 7x7 stem,
four residual stages at (64, 96, 128, 128) channels with strides
(1, 2, 2, 2), all four scales bilinearly upsampled (align_corners=True) to
H/stride and concatenated, then 3x3 -> 2*out and 1x1 -> out head.

Design notes:
- NHWC + bf16-friendly convs: XLA maps these straight onto the MXU.
- Instance norm (the reference's MVTracker config) has no learnable params
  (`nn.InstanceNorm2d` defaults) and normalizes each (sample, channel) over
  space — implemented here as a small fused function.
- align_corners=True bilinear upsampling is expressed as two dense
  interpolation matmuls (one per spatial axis) — exact, and MXU work
  instead of a gather.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm over spatial dims of NHWC, no affine params.

    Single-sweep moments: both E[x] and E[x^2] accumulate in fp32 from the
    (possibly bf16) input WITHOUT materializing an upcast copy — XLA fuses
    the cast+square into the reduction, so the whole norm is ~2 HBM passes
    instead of the 3-4 the naive mean/var/normalize chain lowers to
    (measured 1.3 ms vs 1.8 ms for [96,128,128,64] bf16 on v5e; a fused
    Pallas variant was tried and measured SLOWER — DMA-latency-bound at
    these tiny per-step compute sizes).

    Variance is clamped at 0: the E[x^2]-E[x]^2 form can cancel slightly
    negative on near-constant channels -> rsqrt(negative) = NaN (observed
    in training).
    """
    m1 = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
    m2 = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True, dtype=jnp.float32
    )
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return ((x.astype(jnp.float32) - m1) * inv).astype(x.dtype)


def _interp_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jax.Array:
    """Dense 1D align-corners-True linear interpolation matrix [n_out, n_in]."""
    if n_in == 1:
        return jnp.ones((n_out, 1), dtype)
    if n_out == 1:
        w = np.zeros((1, n_in), np.float32)
        w[0, 0] = 1.0
        return jnp.asarray(w, dtype)
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = pos - lo
    w = np.zeros((n_out, n_in), np.float32)
    w[np.arange(n_out), lo] += 1.0 - frac
    w[np.arange(n_out), hi] += frac
    return jnp.asarray(w, dtype)


def bilinear_resize_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Bilinear resize with torch align_corners=True semantics, NHWC.

    Equivalent to `F.interpolate(..., mode='bilinear', align_corners=True)`
    used at reference `spatracker/blocks.py:253-278`.
    """
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    wh = _interp_matrix(out_h, h, x.dtype)
    ww = _interp_matrix(out_w, w, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", wh, x)
    x = jnp.einsum("ow,bhwc->bhoc", ww, x)
    return x


_KAIMING = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class ResidualBlock(nn.Module):
    """Two 3x3 convs + instance norm, optional strided 1x1 shortcut.

    Mirrors reference `spatracker/blocks.py:69-128` (instance-norm flavor).
    """

    planes: int
    stride: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            kernel_init=_KAIMING,
            dtype=self.dtype,
            name="conv1",
        )(x)
        y = nn.relu(instance_norm(y))
        y = nn.Conv(
            self.planes, (3, 3), padding=((1, 1), (1, 1)), kernel_init=_KAIMING,
            dtype=self.dtype, name="conv2"
        )(y)
        y = nn.relu(instance_norm(y))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = nn.Conv(
                self.planes,
                (1, 1),
                strides=(self.stride, self.stride),
                kernel_init=_KAIMING,
                dtype=self.dtype,
                name="downsample",
            )(x)
            x = instance_norm(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """Multi-scale CNN feature encoder -> [B, H/stride, W/stride, output_dim].

    Re-design of reference `spatracker/blocks.py:130-284` (`BasicEncoder`
    with norm_fn='instance', as configured by MVTracker at
    `mvtracker/mvtracker.py:152-159`).
    """

    output_dim: int = 128
    stride: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        _, h, w, _ = x.shape
        out_h, out_w = h // self.stride, w // self.stride

        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            kernel_init=_KAIMING, dtype=self.dtype, name="conv1",
        )(x)
        x = nn.relu(instance_norm(x))

        a = ResidualBlock(64, stride=1, dtype=self.dtype, name="layer1_0")(x)
        a = ResidualBlock(64, stride=1, dtype=self.dtype, name="layer1_1")(a)
        b = ResidualBlock(96, stride=2, dtype=self.dtype, name="layer2_0")(a)
        b = ResidualBlock(96, stride=1, dtype=self.dtype, name="layer2_1")(b)
        c = ResidualBlock(128, stride=2, dtype=self.dtype, name="layer3_0")(b)
        c = ResidualBlock(128, stride=1, dtype=self.dtype, name="layer3_1")(c)
        d = ResidualBlock(128, stride=2, dtype=self.dtype, name="layer4_0")(c)
        d = ResidualBlock(128, stride=1, dtype=self.dtype, name="layer4_1")(d)

        feats = jnp.concatenate(
            [
                bilinear_resize_align_corners(a, out_h, out_w),
                bilinear_resize_align_corners(b, out_h, out_w),
                bilinear_resize_align_corners(c, out_h, out_w),
                bilinear_resize_align_corners(d, out_h, out_w),
            ],
            axis=-1,
        )
        feats = nn.Conv(
            self.output_dim * 2, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=_KAIMING, dtype=self.dtype, name="conv2",
        )(feats)
        feats = nn.relu(instance_norm(feats))
        feats = nn.Conv(
            self.output_dim, (1, 1), kernel_init=_KAIMING, dtype=self.dtype, name="conv3"
        )(feats)
        return feats.astype(jnp.float32)
