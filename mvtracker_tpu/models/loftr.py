"""LoFTR-style local feature transformer (L2 block).

TPU-native re-design of the reference's vendored LoFTR module
(`mvtracker/models/core/loftr/{linear_attention.py,transformer.py}`), which
the SpaTracker update former uses as a cross-transformer ("gnn") between
track tokens and a persistent bank of support features
(`spatracker/blocks.py:656-662`, `spatracker_monocular.py:379-437`).

Two attention kernels, selected by `attention=`:

- ``"linear"``: the "Transformers are RNNs" kernelized attention
  (elu(x)+1 feature map) from the reference's `linear_attention.py:14-47` —
  O(L·D²) instead of O(L²·D), useful when the token sequence (B·N·S
  flattened track tokens) is long;
- ``"full"``: standard softmax attention — what the reference's vendored
  `transformer.py:17-46` actually runs (it swapped LoFTR's linear kernel
  for `F.scaled_dot_product_attention`). Default, to match.

Layer structure mirrors `transformer.py::TransformerEncoderLayer` (49-103):
bias-free q/k/v/merge projections, post-norm message, feed-forward over
``concat([x, message])`` (2d -> 2d -> d, bias-free), residual add.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_uniform()


def linear_attention(
    q: jax.Array,  # [B, L, H, D]
    k: jax.Array,  # [B, S, H, D]
    v: jax.Array,  # [B, S, H, D]
    q_mask: Optional[jax.Array] = None,  # [B, L] bool
    kv_mask: Optional[jax.Array] = None,  # [B, S] bool
    eps: float = 1e-6,
) -> jax.Array:
    """Kernelized attention with the elu+1 feature map.

    Matches reference `linear_attention.py:20-47` including the
    divide-by-S/multiply-by-S overflow guard.
    """
    q = jax.nn.elu(q) + 1.0
    k = jax.nn.elu(k) + 1.0
    if q_mask is not None:
        q = q * q_mask[:, :, None, None]
    if kv_mask is not None:
        k = k * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    s_len = v.shape[1]
    v = v / s_len
    kv = jnp.einsum("bshd,bshv->bhdv", k, v)
    z = 1.0 / (jnp.einsum("blhd,bhd->blh", q, k.sum(axis=1)) + eps)
    return jnp.einsum("blhd,bhdv,blh->blhv", q, kv, z) * s_len


def full_attention(
    q: jax.Array,  # [B, L, H, D]
    k: jax.Array,  # [B, S, H, D]
    v: jax.Array,  # [B, S, H, D]
    q_mask: Optional[jax.Array] = None,
    kv_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Softmax attention (reference `transformer.py:17-46`; fp32 softmax)."""
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("blhd,bshd->bhls", q, k) * scale
    sim = sim.astype(jnp.float32)
    if kv_mask is not None:
        mask = kv_mask[:, None, None, :]
        if q_mask is not None:
            mask = mask & q_mask[:, None, :, None]
        sim = jnp.where(mask, sim, jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
    return jnp.einsum("bhls,bshd->blhd", attn, v)


class LoFTRLayer(nn.Module):
    """One self- or cross-attention encoder layer.

    Mirrors reference `transformer.py::TransformerEncoderLayer` (49-103).
    """

    d_model: int
    nhead: int
    attention: str = "full"  # "full" | "linear"
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, L, C]
        source: jax.Array,  # [B, S, C]
        x_mask: Optional[jax.Array] = None,
        source_mask: Optional[jax.Array] = None,
    ) -> jax.Array:
        b = x.shape[0]
        dim = self.d_model // self.nhead
        q = nn.Dense(self.d_model, use_bias=False, kernel_init=_XAVIER, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.d_model, use_bias=False, kernel_init=_XAVIER, dtype=self.dtype, name="k_proj")(source)
        v = nn.Dense(self.d_model, use_bias=False, kernel_init=_XAVIER, dtype=self.dtype, name="v_proj")(source)
        q = q.reshape(b, -1, self.nhead, dim)
        k = k.reshape(b, -1, self.nhead, dim)
        v = v.reshape(b, -1, self.nhead, dim)

        if self.attention == "linear":
            message = linear_attention(q, k, v, x_mask, source_mask)
        else:
            message = full_attention(q, k, v, x_mask, source_mask)
        message = message.reshape(b, -1, self.d_model)
        message = nn.Dense(
            self.d_model, use_bias=False, kernel_init=_XAVIER, dtype=self.dtype, name="merge"
        )(message)
        message = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, name="norm1")(message)

        message = jnp.concatenate([x, message], axis=-1)
        message = nn.Dense(
            2 * self.d_model, use_bias=False, kernel_init=_XAVIER, dtype=self.dtype, name="mlp_0"
        )(message)
        message = nn.relu(message)
        message = nn.Dense(
            self.d_model, use_bias=False, kernel_init=_XAVIER, dtype=self.dtype, name="mlp_1"
        )(message)
        message = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False, dtype=self.dtype, name="norm2")(message)
        return x + message


class LocalFeatureTransformer(nn.Module):
    """Alternating self/cross transformer over two token sets.

    Mirrors reference `transformer.py::LocalFeatureTransformer` (106-146):
    per layer-name, 'self' updates each set with its own layer applied to
    both sets, 'cross' updates feat0 against feat1 and then feat1 against
    the UPDATED feat0 (reference order).
    """

    d_model: int
    nhead: int = 4
    layer_names: Sequence[str] = ("self", "cross", "self", "cross", "self", "cross")
    attention: str = "full"
    dtype: object = None

    @nn.compact
    def __call__(
        self,
        feat0: jax.Array,  # [B, L, C]
        feat1: jax.Array,  # [B, S, C]
        mask0: Optional[jax.Array] = None,
        mask1: Optional[jax.Array] = None,
    ):
        for i, name in enumerate(self.layer_names):
            layer = LoFTRLayer(
                self.d_model, self.nhead, attention=self.attention,
                dtype=self.dtype, name=f"layer_{i}",
            )
            if name == "self":
                feat0 = layer(feat0, feat0, mask0, mask0)
                feat1 = layer(feat1, feat1, mask1, mask1)
            elif name == "cross":
                feat0 = layer(feat0, feat1, mask0, mask1)
                feat1 = layer(feat1, feat0, mask1, mask0)
            else:
                raise KeyError(f"unknown layer name {name!r}")
        return feat0, feat1
