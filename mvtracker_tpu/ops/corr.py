"""Grouped neighbor correlation (L1).

Re-design of the reference's `PointcloudCorrBlock.corr_sample` inner math
(`mvtracker/mvtracker.py:800-846`): gather the k nearest neighbors' feature
vectors from the fused cloud and correlate them with per-track target
features, grouped along channels:

    corr[b, m, k, g] = <target[b, m, g, :], neighbor_fvec[b, m, k, g, :]>
                       / sqrt(C / G)

On TPU the gather is the expensive part (random access into HBM); the
correlation itself is a small batched contraction that XLA fuses. The
public entry also appends neighbor offsets / absolute positions exactly like
the reference (`mvtracker/mvtracker.py:840-846`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_neighbors(values: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather [B, P, C] values at [B, M, K] indices -> [B, M, K, C]."""
    b, m, k = idx.shape
    flat_idx = idx.reshape(b, m * k)
    out = jnp.take_along_axis(values, flat_idx[..., None], axis=1)
    return out.reshape(b, m, k, values.shape[-1])


def grouped_correlation(
    targets: jax.Array,  # [B, M, C]
    neighbor_fvec: jax.Array,  # [B, M, K, C]
    groups: int = 1,
) -> jax.Array:
    """Channel-grouped dot-product correlation -> [B, M, K, G].

    Matches reference `mvtracker/mvtracker.py:832-835` including the
    1/sqrt(C/G) scaling.
    """
    b, m, c = targets.shape
    k = neighbor_fvec.shape[2]
    tg = targets.reshape(b, m, groups, c // groups)
    ng = neighbor_fvec.reshape(b, m, k, groups, c // groups)
    corr = jnp.einsum("bmgc,bmkgc->bmkg", tg, ng, preferred_element_type=jnp.float32)
    return (corr / jnp.sqrt(c / groups)).astype(targets.dtype)


def corr_sample(
    cloud_xyz: jax.Array,  # [B, P, 3]
    cloud_fvec: jax.Array,  # [B, P, C]
    targets: jax.Array,  # [B, M, C]
    coords_xyz: jax.Array,  # [B, M, 3]
    neighbor_idx: jax.Array,  # [B, M, K] (from ops.knn on cloud_xyz)
    groups: int = 1,
    add_neighbor_offset: bool = True,
    add_neighbor_xyz: bool = False,
    backend: str = "auto",
    compute_dtype=None,  # bf16 halves the Pallas kernel's stream traffic
) -> jax.Array:
    """Correlation features for each track point, given precomputed kNN.

    Output feature layout per neighbor matches the reference
    (`mvtracker/mvtracker.py:832-846`): [corr (G) | offset (3)? | xyz (3)?],
    flattened over neighbors by the caller. Returns [B, M, K, F].

    backend="auto" uses the fused Pallas matmul+select kernel on TPU for the
    single-group case (avoids the slow random-access feature gather); the
    gather+einsum path covers everything else.
    """
    if backend in ("pallas", "pallas_interpret") and groups != 1:
        # Honor the explicit request instead of silently serving the slow
        # gather path (the fused kernel is single-group only).
        raise ValueError("corr backend='pallas' supports groups == 1 only")
    use_pallas = (
        backend in ("auto", "pallas", "pallas_interpret")
        and groups == 1
        and (backend != "auto" or jax.default_backend() not in ("cpu", "gpu"))
    )
    if use_pallas:
        from mvtracker_tpu.ops.corr_pallas import corr_select_pallas

        c = cloud_fvec.shape[-1]
        corr = corr_select_pallas(
            cloud_fvec, targets, neighbor_idx, None, 2048,
            backend == "pallas_interpret", compute_dtype,
        )
        out = (corr[..., None] / jnp.sqrt(float(c))).astype(targets.dtype)
    else:
        neighbor_fvec = gather_neighbors(cloud_fvec, neighbor_idx)
        out = grouped_correlation(targets, neighbor_fvec, groups)
    if add_neighbor_offset or add_neighbor_xyz:
        neighbor_xyz = gather_neighbors(cloud_xyz, neighbor_idx)
        if add_neighbor_offset:
            offset = neighbor_xyz - coords_xyz[:, :, None, :]
            out = jnp.concatenate([out, offset.astype(out.dtype)], axis=-1)
        if add_neighbor_xyz:
            out = jnp.concatenate([out, neighbor_xyz.astype(out.dtype)], axis=-1)
    return out
