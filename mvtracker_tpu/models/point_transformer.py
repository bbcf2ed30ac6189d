"""Serialized point-cloud transformer (L2) — the PTv3-equivalent backbone.

The reference vendors Point Transformer V3 as an alternative feature
backbone for the fused cloud (`mvtracker/models/core/ptv3/model.py`,
toggled by `use_ptv3`): sparse 3D convs (spconv), variable-length flash
attention, and z-order/Hilbert serialization
(`ptv3/serialization/{z_order,hilbert}.py`). None of those CUDA-shaped
pieces map to TPU; the TPU-idiomatic equivalent keeps the *idea* —
serialize 3D points along a space-filling curve so neighborhood attention
becomes attention over contiguous runs — and drops the sparse machinery:

1. quantize xyz to a voxel grid and compute Morton (z-order) keys;
2. argsort points by key: spatial neighbors become sequence neighbors;
3. dense blocked attention over fixed-size groups of the sorted sequence
   (static shapes, MXU matmuls) — alternating blocks shift the grouping by
   half a group and permute the xyz interleave order, mimicking PTv3's
   shifted windows / order shuffling;
4. scatter features back to the original point order.

Everything is static-shape, jit/vmap friendly, and runs per (frame) cloud.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvtracker_tpu.models.updateformer import Attention, Mlp, _layer_norm_noaffine


def _spread_bits(v: jax.Array) -> jax.Array:
    """Spread the low 10 bits of int32 v so there are 2 zero bits between
    each (Morton interleave helper)."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def morton_code(xyz: jax.Array, bits: int = 10, order=(0, 1, 2)) -> jax.Array:
    """Z-order key of [..., 3] points normalized per-cloud to the unit cube.

    `order` permutes which axis gets which interleave slot — alternating
    orders across blocks plays the role of PTv3's multi-order serialization
    (`ptv3/serialization/z_order.py`).
    """
    lo = jax.lax.stop_gradient(xyz.min(axis=-2, keepdims=True))
    hi = jax.lax.stop_gradient(xyz.max(axis=-2, keepdims=True))
    q = (xyz - lo) / jnp.maximum(hi - lo, 1e-6) * (2**bits - 1)
    q = q.astype(jnp.int32)
    a = _spread_bits(q[..., order[0]])
    b = _spread_bits(q[..., order[1]])
    c = _spread_bits(q[..., order[2]])
    return a | (b << 1) | (c << 2)


class SerializedAttentionBlock(nn.Module):
    """Pre-LN attention over contiguous groups of the serialized sequence."""

    dim: int
    num_heads: int = 4
    group_size: int = 128
    shift: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [P, C], already sorted
        p, c = x.shape
        g = self.group_size
        if self.shift:
            x = jnp.roll(x, g // 2, axis=0)
        pad = (-p) % g
        xp = jnp.pad(x, ((0, pad), (0, 0)))
        groups = xp.reshape(-1, g, c)  # [P/G, G, C]

        # Key-side mask: zero-padded rows in the last group must not act as
        # keys/values (their k/v would come purely from the projection
        # bias, skewing real points' attention).
        # (The roll happens BEFORE padding, so padded rows are always the
        # trailing `pad` rows of xp in both shifted and plain blocks.)
        key_mask = None
        if pad:
            key_mask = (jnp.arange(xp.shape[0]) < p).reshape(-1, g)

        y = Attention(self.dim, num_heads=self.num_heads, dim_head=max(c // self.num_heads, 16), dtype=self.dtype, name="attn")(
            _layer_norm_noaffine(groups).astype(groups.dtype), key_mask=key_mask
        )
        groups = groups + y
        groups = groups + Mlp(c * 4, c, dtype=self.dtype, name="mlp")(
            _layer_norm_noaffine(groups).astype(groups.dtype)
        )
        out = groups.reshape(-1, c)[:p]
        if self.shift:
            out = jnp.roll(out, -(g // 2), axis=0)
        return out


class SerializedPointTransformer(nn.Module):
    """Refines per-point features of a fused cloud: [P, 3], [P, C] -> [P, C].

    Depth blocks alternate (a) plain vs shifted grouping and (b) xyz vs zxy
    Morton orders, so information propagates across group boundaries and
    curve discontinuities — the dense analog of PTv3's shifted serialized
    attention (`ptv3/model.py:166-547`).
    """

    dim: int = 128
    depth: int = 4
    num_heads: int = 4
    group_size: int = 128
    dtype: object = None

    @nn.compact
    def __call__(self, xyz: jax.Array, feats: jax.Array) -> jax.Array:
        p, c = feats.shape
        x = nn.Dense(self.dim, dtype=self.dtype, name="proj_in")(feats)

        orders = [(0, 1, 2), (2, 0, 1)]
        for d in range(self.depth):
            key = morton_code(xyz, order=orders[d % 2])
            perm = jnp.argsort(key)
            inv = jnp.argsort(perm)
            xs = x[perm]
            xs = SerializedAttentionBlock(
                self.dim,
                num_heads=self.num_heads,
                group_size=self.group_size,
                shift=bool(d % 2),
                dtype=self.dtype,
                name=f"block_{d}",
            )(xs)
            x = xs[inv]

        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(x)
        return (feats + out).astype(feats.dtype)  # residual refinement
