"""Fused Pallas correlation kernel (L1).

Replaces the gather-then-einsum path of `corr_sample` for the default
single-group configuration. XLA's row gather of neighbor features runs at
~13 GB/s effective (random access); this kernel never gathers feature rows
at all:

  1. stream reference-cloud feature tiles [P_t, C] through VMEM and compute
     the FULL correlation tile  corr = targets @ fvec_tile^T  on the MXU
     (the "wasted" FLOPs on non-neighbors are ~1 GFLOP — microseconds on
     the MXU, far cheaper than the random-access gather they replace);
  2. select each query's K neighbor correlations from the VMEM-resident
     tile with compare-masks against the kNN indices (elementwise VPU work,
     no dynamic indexing), accumulating into the [N, K] output across
     tiles.

Neighbor xyz offsets (3 floats/neighbor) stay on the XLA gather path — that
gather is 40x smaller and cheap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _corr_kernel(t_ref, f_ref, i_ref, out_ref, *, k: int, ref_tile: int):
    """Grid (B, P_tiles); P_tiles sequential, accumulating into out_ref.

    t_ref: [1, N, C] targets; f_ref: [1, P_t, C] fvec tile;
    i_ref: [1, N, K_pad] kNN indices; out_ref: [1, N, K_pad].
    """
    pt = pl.program_id(1)
    targets = t_ref[0]  # [N, C]
    fvec = f_ref[0]  # [P_t, C]
    idx = i_ref[0]  # [N, K_pad]

    # Full correlation tile on the MXU.
    corr = jax.lax.dot_general(
        targets, fvec, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [N, P_t]

    @pl.when(pt == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    base = pt * ref_tile
    n = corr.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1) + base  # [N, P_t]

    acc = out_ref[0]
    updates = []
    for kk in range(k):
        sel = cols == idx[:, kk][:, None]  # [N, P_t]
        updates.append(jnp.sum(jnp.where(sel, corr, 0.0), axis=1, keepdims=True))
    k_pad = acc.shape[1]
    fill = jnp.zeros((n, k_pad - k), jnp.float32)
    out_ref[0] = acc + jnp.concatenate(updates + [fill], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def corr_select_pallas(
    cloud_fvec: jax.Array,  # [B, P, C]
    targets: jax.Array,  # [B, N, C]
    idx: jax.Array,  # [B, N, K]
    k: int | None = None,
    ref_tile: int = 2048,
    interpret: bool = False,
    compute_dtype=None,  # stream/matmul dtype; None = fp32
) -> jax.Array:
    """Correlations <target_n, fvec_{idx[n,k]}> -> [B, N, K] fp32 (unscaled).

    Custom VJP: the forward avoids the random gather entirely (matmul +
    select, see module docstring); the backward IS naturally a small
    gather/scatter — d_target = sum_k g * fvec[idx], d_fvec = scatter-add of
    g * target — and runs as plain XLA.

    `compute_dtype=jnp.bfloat16` halves the kernel's HBM traffic and runs
    the correlation matmul on the bf16 MXU (fp32 accumulate) — this matches
    the reference, which computes correlations under bf16 autocast
    (`configs/model/mvtracker.yaml:57`).
    """
    return _corr_select_fwd_impl(
        cloud_fvec, targets, idx, k, ref_tile, interpret, compute_dtype
    )


@functools.partial(jax.jit, static_argnames=("k", "ref_tile", "interpret", "compute_dtype"))
def _corr_select_fwd_impl(cloud_fvec, targets, idx, k, ref_tile, interpret, compute_dtype=None):
    b, p, c = cloud_fvec.shape
    n = targets.shape[1]
    if k is None:
        k = idx.shape[2]
    k_pad = max(k, 128)
    dt = jnp.float32 if compute_dtype is None else compute_dtype

    rpad = (-p) % ref_tile
    fvec_p = jnp.pad(cloud_fvec.astype(dt), ((0, 0), (0, rpad), (0, 0)))
    # Padded rows correlate but are never selected (indices < P).
    idx_p = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, 0), (0, k_pad - k)), constant_values=-1)

    grid = (b, (p + rpad) // ref_tile)
    out = pl.pallas_call(
        functools.partial(_corr_kernel, k=k, ref_tile=ref_tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n, c), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, ref_tile, c), lambda bi, pi: (bi, pi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, n, k_pad), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, n, k_pad), lambda bi, pi: (bi, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, k_pad), jnp.float32),
        interpret=interpret,
    )(targets.astype(dt), fvec_p, idx_p)
    return out[:, :, :k]


def _corr_select_fwd(cloud_fvec, targets, idx, k, ref_tile, interpret, compute_dtype):
    out = _corr_select_fwd_impl(
        cloud_fvec, targets, idx, k, ref_tile, interpret, compute_dtype
    )
    return out, (cloud_fvec, targets, idx)


def _corr_select_bwd(k, ref_tile, interpret, compute_dtype, residuals, g):
    cloud_fvec, targets, idx = residuals
    b, p, c = cloud_fvec.shape
    n, kk = idx.shape[1], idx.shape[2]
    g = g.astype(jnp.float32)

    # d_targets[n] = sum_k g[n, k] * fvec[idx[n, k]]
    flat_idx = idx.reshape(b, n * kk)
    gathered = jnp.take_along_axis(
        cloud_fvec.astype(jnp.float32), flat_idx[..., None], axis=1
    ).reshape(b, n, kk, c)
    d_targets = jnp.einsum("bnk,bnkc->bnc", g, gathered).astype(targets.dtype)

    # d_fvec[p] = scatter-add over (n, k) with idx == p of g[n,k] * targets[n]
    updates = (g[..., None] * targets.astype(jnp.float32)[:, :, None, :]).reshape(
        b, n * kk, c
    )
    d_fvec = jax.vmap(
        lambda acc, ii, up: acc.at[ii].add(up, mode="drop")
    )(jnp.zeros((b, p, c), jnp.float32), flat_idx, updates).astype(cloud_fvec.dtype)

    return d_fvec, d_targets, None


corr_select_pallas.defvjp(_corr_select_fwd, _corr_select_bwd)
