"""Factorized space/time update transformer (L2).

TPU-native re-design of the reference's `EfficientUpdateFormer`
(`mvtracker/models/core/cotracker2/blocks.py:340-494`): per-track temporal
attention over the S window tokens interleaved with spatial attention
bottlenecked through a small set of learnable virtual-track tokens —
virtual<-point cross-attn, virtual self-attn, point<-virtual cross-attn.
This factorization keeps cost O(N*T^2 + T*N*K_virt) instead of O((N*T)^2)
and maps to dense MXU matmuls at every step.

Differences from the reference, deliberate:
- attention runs through a single fused einsum-softmax-einsum path that XLA
  lowers to its fused TPU attention; no separate "FlashAttention" class is
  needed (the reference keeps two, `blocks.py:212-271`, because of CUDA
  backend dispatch);
- a key-side validity mask is threaded to the virtual<-point cross-attn so
  padded/inactive tracks (static-shape padding) are invisible to the
  virtual tokens — this replaces the reference's dynamic active-track set
  (`mvtracker/mvtracker.py:538-541`) without dynamic shapes.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_XAVIER = nn.initializers.xavier_uniform()
_TRUNC001 = nn.initializers.truncated_normal(stddev=0.001)


def _layer_norm_noaffine(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    mean = x.mean(axis=-1, keepdims=True)
    # max(var, 0): XLA's E[x^2]-E[x]^2 rewrite can cancel slightly negative.
    var = jnp.maximum(x.var(axis=-1, keepdims=True), 0.0)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class Attention(nn.Module):
    """Multi-head attention, optionally cross, with key-side masking.

    Mirrors reference `cotracker2/blocks.py:212-271` (dim_head fixed at 48).
    """

    query_dim: int
    num_heads: int = 8
    dim_head: int = 48
    qkv_bias: bool = True
    dtype: object = None  # compute dtype (bf16 for MXU); params stay fp32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, Nq, C]
        context: Optional[jax.Array] = None,  # [B, Nk, C]
        key_mask: Optional[jax.Array] = None,  # [B, Nk] bool
        pair_mask: Optional[jax.Array] = None,  # [Nq, Nk] bool (static pattern)
    ) -> jax.Array:
        inner = self.num_heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=self.qkv_bias, kernel_init=_XAVIER, dtype=self.dtype, name="to_q")(x)
        kv = nn.Dense(2 * inner, use_bias=self.qkv_bias, kernel_init=_XAVIER, dtype=self.dtype, name="to_kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)

        b, nq, _ = q.shape
        nk = k.shape[1]
        q = q.reshape(b, nq, self.num_heads, self.dim_head)
        k = k.reshape(b, nk, self.num_heads, self.dim_head)
        v = v.reshape(b, nk, self.num_heads, self.dim_head)

        scale = self.dim_head**-0.5
        sim = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        # Softmax in fp32 regardless of compute dtype (numerics).
        sim = sim.astype(jnp.float32)
        if key_mask is not None:
            sim = jnp.where(key_mask[:, None, None, :], sim, jnp.finfo(jnp.float32).min)
        if pair_mask is not None:
            sim = jnp.where(pair_mask[None, None], sim, jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, nq, inner)
        return nn.Dense(self.query_dim, kernel_init=_XAVIER, dtype=self.dtype, name="to_out")(out)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=_XAVIER, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        return nn.Dense(self.out, kernel_init=_XAVIER, dtype=self.dtype, name="fc2")(x)


class AttnBlock(nn.Module):
    """Pre-LN self-attention block (reference `cotracker2/blocks.py:274-302`)."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, key_mask=None, pair_mask=None):
        x = x + Attention(
            self.hidden_size, num_heads=self.num_heads, dtype=self.dtype, name="attn"
        )(_layer_norm_noaffine(x).astype(x.dtype), key_mask=key_mask, pair_mask=pair_mask)
        x = x + Mlp(
            int(self.hidden_size * self.mlp_ratio), self.hidden_size, dtype=self.dtype, name="mlp"
        )(_layer_norm_noaffine(x).astype(x.dtype))
        return x


class CrossAttnBlock(nn.Module):
    """Pre-LN cross-attention block (reference `cotracker2/blocks.py:305-337`).

    Context normalization has learnable affine (as in the reference's
    `norm_context = nn.LayerNorm(hidden_size)`).
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: object = None

    @nn.compact
    def __call__(self, x, context, key_mask=None):
        ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, use_fast_variance=False, name="norm_context")(context)
        x = x + Attention(
            self.hidden_size, num_heads=self.num_heads, dtype=self.dtype, name="cross_attn"
        )(_layer_norm_noaffine(x).astype(x.dtype), context=ctx, key_mask=key_mask)
        x = x + Mlp(
            int(self.hidden_size * self.mlp_ratio), self.hidden_size, dtype=self.dtype, name="mlp"
        )(_layer_norm_noaffine(x).astype(x.dtype))
        return x


class _UpdateLayer(nn.Module):
    """One update layer: packed time attention + the space virtual-track
    triple (virtual<-point, virtual self, point<-virtual).

    The body of `EfficientUpdateFormer`'s depth loop when the time/space
    interleave is 1:1 (`interval == 1`, the flagship configuration) —
    factored out so the loop can run as ONE `nn.scan` with stacked
    parameters: the layer is traced and compiled once instead of
    `depth` times, cutting the transformer's share of the flagship's
    cold-compile time roughly by the depth factor. Numerics are identical
    to the unrolled loop.
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    n_points: int  # real (non-virtual) tracks at the front of the token axis
    time_pack: int
    dtype: object = None

    @nn.compact
    def __call__(self, tokens, key_mask_bt, diag):
        b, n_tot, t, c = tokens.shape
        g = self.time_pack
        rows = b * n_tot
        tt = tokens.reshape(rows, t, c)
        if g > 1:
            pad_rows = (-rows) % g
            ttp = jnp.pad(tt, ((0, pad_rows), (0, 0), (0, 0)))
            ttp = ttp.reshape((rows + pad_rows) // g, g * t, c)
            ttp = AttnBlock(
                self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name="time"
            )(ttp, pair_mask=diag)
            tt = ttp.reshape(rows + pad_rows, t, c)[:rows]
        else:
            tt = AttnBlock(
                self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name="time"
            )(tt)
        tokens = tt.reshape(b, n_tot, t, c)

        st = tokens.transpose(0, 2, 1, 3).reshape(b * t, n_tot, c)
        point_tokens = st[:, : self.n_points]
        virtual_tokens = st[:, self.n_points :]
        virtual_tokens = CrossAttnBlock(
            self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name="sv2p"
        )(virtual_tokens, point_tokens, key_mask=key_mask_bt)
        virtual_tokens = AttnBlock(
            self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name="svirt"
        )(virtual_tokens)
        point_tokens = CrossAttnBlock(
            self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name="sp2v"
        )(point_tokens, virtual_tokens)
        st = jnp.concatenate([point_tokens, virtual_tokens], axis=1)
        tokens = st.reshape(b, t, n_tot, c).transpose(0, 2, 1, 3)
        return tokens, None


class EfficientUpdateFormer(nn.Module):
    """Factorized space/time transformer over [B, N, T, C_in] track tokens.

    Mirrors reference `cotracker2/blocks.py:340-494`. `track_mask` ([B, N]
    bool), when given, hides padded/inactive tracks from the virtual tokens.
    """

    space_depth: int = 6
    time_depth: int = 6
    input_dim: int = 320
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    num_virtual_tracks: int = 64
    dtype: object = None
    # Sequence packing for the time attention: run G track-sequences of T
    # tokens as ONE attention of length G*T with a block-diagonal pair mask.
    # Numerically identical, but the score matrix goes from [T, T] (T=12 —
    # 90% lane padding on 128-lane TPU registers, measured 0.18 ms per
    # block for 26 MFLOPs) to [G*T, G*T] with near-full lanes. 0 disables.
    # G=8 measured best on v5e (full module 2.40 -> 1.78 ms at the
    # flagship's window shapes; G=16/32 within noise of 8).
    time_pack: int = 8
    # Unroll factor for the scanned layer stack (1:1 interleave path):
    # 1 = true loop (smallest graph, fastest compile; pays a dynamic-slice
    # copy of each layer's params per step), depth = fully unrolled inside
    # one traced body (param slices become static, old runtime). Measured
    # on v5e at the flagship shapes — see NOTES.md.
    scan_unroll: int = 1
    # LoFTR-style support-feature memory (reference SpaTracker's "gnn":
    # `spatracker/blocks.py:656-662`, bank init 0.1 at
    # `spatracker_multiview.py:112`): when > 0, the point tokens
    # cross-refine against this many learnable memory tokens through an
    # alternating self/cross transformer before the flow head. The
    # reference additionally persists residual bank updates across
    # windows as mutable module state (`spatracker_monocular.py:437,475`)
    # — a torch-ism dropped here; the bank is a learned parameter.
    support_memory_tokens: int = 0
    support_memory_attention: str = "full"  # "full" | "linear"

    @nn.compact
    def __call__(self, x: jax.Array, track_mask: Optional[jax.Array] = None) -> jax.Array:
        if self.add_space_attn and (
            self.space_depth <= 0 or self.time_depth % self.space_depth != 0
        ):
            # The interleave below needs an integer interval; the reference
            # has the same implicit contract (`blocks.py:689` asserts only
            # >=, then crashes on non-divisible depths too).
            raise ValueError(
                f"time_depth ({self.time_depth}) must be a positive multiple "
                f"of space_depth ({self.space_depth}) when add_space_attn"
            )
        b, n, t, _ = x.shape
        if self.dtype is not None:
            x = x.astype(self.dtype)
        tokens = nn.Dense(
            self.hidden_size, kernel_init=_XAVIER, dtype=self.dtype, name="input_transform"
        )(x)

        virtual = self.param(
            "virtual_tracks",
            nn.initializers.normal(stddev=1.0),
            (1, self.num_virtual_tracks, 1, self.hidden_size),
        )
        virtual = jnp.broadcast_to(virtual, (b, self.num_virtual_tracks, t, self.hidden_size))
        tokens = jnp.concatenate([tokens, virtual.astype(tokens.dtype)], axis=1)
        n_tot = n + self.num_virtual_tracks

        key_mask_bt = None
        if track_mask is not None:
            # [B, N] -> [B*T, N] matching the (B T) flattening below.
            key_mask_bt = jnp.repeat(track_mask, t, axis=0)

        # Block-diagonal pair mask for packed time attention (see time_pack).
        g = self.time_pack
        rows = b * n_tot
        diag = None
        if g > 1:
            pad_rows = (-rows) % g
            diag = jnp.kron(jnp.eye(g, dtype=jnp.int8), jnp.ones((t, t), jnp.int8)) > 0

        if self.add_space_attn and self.time_depth == self.space_depth:
            # 1:1 time/space interleave (the flagship config): one scanned
            # layer with stacked params — compiled once, not depth times.
            scanned = nn.scan(
                _UpdateLayer,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=self.time_depth,
                unroll=min(self.scan_unroll, self.time_depth),
            )
            tokens, _ = scanned(
                self.hidden_size,
                self.num_heads,
                self.mlp_ratio,
                n_points=n,
                time_pack=g,
                dtype=self.dtype,
                name="layers",
            )(tokens, key_mask_bt, diag)
            return self._head(tokens, n, track_mask)

        time_blocks = [
            AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"time_{i}")
            for i in range(self.time_depth)
        ]
        if self.add_space_attn:
            v2p = [
                CrossAttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"sv2p_{i}")
                for i in range(self.space_depth)
            ]
            vself = [
                AttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"svirt_{i}")
                for i in range(self.space_depth)
            ]
            p2v = [
                CrossAttnBlock(self.hidden_size, self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"sp2v_{i}")
                for i in range(self.space_depth)
            ]
            interval = self.time_depth // self.space_depth

        if g > 1:
            pad_rows = (-rows) % g

        j = 0
        for i in range(self.time_depth):
            tt = tokens.reshape(rows, t, self.hidden_size)
            if g > 1:
                ttp = jnp.pad(tt, ((0, pad_rows), (0, 0), (0, 0)))
                ttp = ttp.reshape((rows + pad_rows) // g, g * t, self.hidden_size)
                ttp = time_blocks[i](ttp, pair_mask=diag)
                tt = ttp.reshape(rows + pad_rows, t, self.hidden_size)[:rows]
            else:
                tt = time_blocks[i](tt)
            tokens = tt.reshape(b, n_tot, t, self.hidden_size)

            if self.add_space_attn and i % interval == 0:
                st = tokens.transpose(0, 2, 1, 3).reshape(b * t, n_tot, self.hidden_size)
                point_tokens = st[:, :n]
                virtual_tokens = st[:, n:]

                virtual_tokens = v2p[j](virtual_tokens, point_tokens, key_mask=key_mask_bt)
                virtual_tokens = vself[j](virtual_tokens)
                point_tokens = p2v[j](point_tokens, virtual_tokens)

                st = jnp.concatenate([point_tokens, virtual_tokens], axis=1)
                tokens = st.reshape(b, t, n_tot, self.hidden_size).transpose(0, 2, 1, 3)
                j += 1

        return self._head(tokens, n, track_mask)

    def _head(
        self, tokens: jax.Array, n: int, track_mask: Optional[jax.Array] = None
    ) -> jax.Array:
        # Helper invoked from the (single) compact `__call__`; submodule
        # definitions here live in its compact scope.
        tokens = tokens[:, :n].astype(jnp.float32)
        if self.support_memory_tokens > 0:
            from mvtracker_tpu.models.loftr import LocalFeatureTransformer

            b, n_, t, c = tokens.shape
            mem = self.param(
                "support_memory",
                nn.initializers.constant(0.1),  # reference bank init
                (1, self.support_memory_tokens, self.hidden_size),
            )
            flat = tokens.reshape(b, n_ * t, c)
            # Inactive/padded tracks must stay invisible here too (same
            # static-shape invariant as the virtual-token key mask above):
            # flattening order is (track, time), so repeat per track.
            flat_mask = None
            if track_mask is not None:
                flat_mask = jnp.repeat(track_mask, t, axis=1)  # [B, N*T]
            flat, _ = LocalFeatureTransformer(
                self.hidden_size,
                nhead=4,
                attention=self.support_memory_attention,
                name="gnn",
            )(
                flat,
                jnp.broadcast_to(mem, (b,) + mem.shape[1:]),
                mask0=flat_mask,
            )
            tokens = flat.reshape(b, n_, t, c)
        y = nn.Dense(self.output_dim, kernel_init=_TRUNC001, name="flow_head_0")(tokens)
        y = nn.relu(y)
        y = nn.Dense(self.output_dim, kernel_init=_TRUNC001, name="flow_head_1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.output_dim, kernel_init=_TRUNC001, name="flow_head_2")(y)
        return y
