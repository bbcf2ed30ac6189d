"""Batched k-nearest-neighbor search — the hottest non-matmul op.

The reference uses an external CUDA kernel (`pointops.knn_query`, dispatched
at `mvtracker/mvtracker.py:26-90`) with a `torch.cdist`+`topk` fallback. On
TPU we re-design it around the MXU:

    dist^2(q, r) = |q|^2 - 2 q.r + |r|^2

so the dominant term is a batched matmul. Two interchangeable backends:

- ``knn_xla``: distances as one fused matmul + ``lax.top_k``, chunked over
  queries so the [M, N] distance tile stays bounded in HBM.
- ``knn_pallas``: a Pallas kernel that streams reference-point tiles through
  VMEM and maintains a running top-k per query, never materializing the
  full distance matrix in HBM.

Both return (dists, indices) with shapes [B, M, k], sorted ascending,
matching the reference contract (`mvtracker/mvtracker.py:42-50`). Distances
are Euclidean (not squared). Ties may be broken differently than the CUDA
kernel; callers must not rely on tie order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # plain python float so pallas kernels do not capture a traced const


def _sq_dists(query: jax.Array, ref: jax.Array) -> jax.Array:
    """Squared distances [B, M, N] from [B, M, 3] x [B, N, 3], fp32.

    Computed as |q|^2 - 2 q.r + |r|^2 with the cross term on the MXU.
    Numerics: points are centered on a shared query point first (the
    expansion suffers catastrophic cancellation for points far from the
    origin), and the cross term runs at HIGHEST precision — TPU's default
    matmul precision is bf16, which is useless for cm-scale distances in
    m-scale scenes.

    PRECISION CONTRACT (all backends, incl. the Pallas kernels' per-tile
    centering): the expansion's absolute d^2 error is ~eps_fp32 * max
    |p - center|^2, so queries and the references they care about must
    span a BOUNDED region (|p - center| up to ~1e3 keeps the error below
    ~1e-1-scale neighbor distances). Outlier sentinel points are fine as
    REFERENCES (their own d^2 is huge and excluded anyway) but an outlier
    QUERY that lands at a tile's centering position corrupts the whole
    tile — keep sentinel magnitudes moderate (e.g. 1e2, not 1e6; see
    `models/dynamic3dgs.py::build_rigidity_refs`) or use 1e9 only for
    reference-side padding.
    """
    query = query.astype(jnp.float32)
    ref = ref.astype(jnp.float32)
    # First query as center (not the mean: zero-padded chunk tails from
    # knn_xla's query chunking would skew a mean).
    center = query[:, 0:1]
    query = query - center
    ref = ref - center
    qn = jnp.sum(query * query, axis=-1)  # [B, M]
    rn = jnp.sum(ref * ref, axis=-1)  # [B, N]
    cross = jax.lax.dot_general(
        query,
        ref,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, M, N]
    d2 = qn[:, :, None] - 2.0 * cross + rn[:, None, :]
    return jnp.maximum(d2, 0.0)


def _safe_sqrt(d2):
    """sqrt with an epsilon floor: d/dx sqrt(x) -> inf at 0, and exact zeros
    are common (clamped cancellation, query==cloud point). The floor routes
    the gradient through the max (zero) instead of producing inf*0 = NaN in
    backward passes."""
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def knn_reference(ref: jax.Array, query: jax.Array, k: int):
    """Plain full-matrix kNN; ground truth for tests. [B,N,3],[B,M,3] -> [B,M,k].

    k > N follows the same fill contract as the Pallas kernels: ranks
    beyond the cloud get a huge distance and index 0 (callers treat ranks
    >= N as padding, `models/mvtracker.py::_corr_features` wrap) — without
    this, lax.top_k raises and the backends diverge on coarse pyramid
    levels with fewer points than corr_neighbors.
    """
    n = ref.shape[1]
    if k > n:
        d, i = knn_reference(ref, query, n)
        fill = d.shape[:-1] + (k - n,)
        d = jnp.concatenate([d, jnp.full(fill, _safe_sqrt(_BIG), d.dtype)], -1)
        i = jnp.concatenate([i, jnp.zeros(fill, i.dtype)], -1)
        return d, i
    d2 = _sq_dists(query, ref)
    neg_d2, idx = jax.lax.top_k(-d2, k)
    return _safe_sqrt(-neg_d2), idx


@functools.partial(jax.jit, static_argnames=("k", "query_chunk"))
def knn_xla(ref: jax.Array, query: jax.Array, k: int, query_chunk: int = 512):
    """Chunked XLA kNN: full distances per query chunk, then lax.top_k.

    The chunking bounds peak HBM use to O(B * query_chunk * N) while keeping
    each distance computation a single large MXU matmul.
    """
    b, m, _ = query.shape
    if m <= query_chunk:
        return knn_reference(ref, query, k)

    pad = (-m) % query_chunk
    query_p = jnp.pad(query, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (m + pad) // query_chunk
    query_c = query_p.reshape(b, n_chunks, query_chunk, 3).transpose(1, 0, 2, 3)

    def body(_, q):
        d, i = knn_reference(ref, q, k)
        return None, (d, i)

    _, (dists, idx) = jax.lax.scan(body, None, query_c)
    dists = dists.transpose(1, 0, 2, 3).reshape(b, m + pad, k)[:, :m]
    idx = idx.transpose(1, 0, 2, 3).reshape(b, m + pad, k)[:, :m]
    return dists, idx


# ---------------------------------------------------------------------------
# Pallas streaming kernel
# ---------------------------------------------------------------------------


def _knn_kernel(q_ref, r_ref, dist_out, idx_out, *, k: int, ref_tile: int, n_real: int):
    """Grid: (B, M_tiles, N_tiles); N_tiles is the innermost (sequential)
    reduction dimension. Maintains a running top-k in the output refs.

    q_ref:   [TQ, 8]   query coords, xyz padded with zeros to 8 lanes... no:
             coords come in as [TQ, 128]-padded blocks; see caller.
    """
    nt = pl.program_id(2)

    # Load tiles; coords are stored transposed as [3, M] / [3, N] so the
    # point axis lies along VMEM lanes. Block shapes carry a leading
    # singleton batch dim.
    q = q_ref[0]  # [3, TQ]
    r = r_ref[0]  # [3, TN]

    # Center on the query tile mean: the |q|^2 - 2qr + |r|^2 expansion
    # cancels catastrophically for coordinates far from the origin, and the
    # MXU cross-term must run at HIGHEST precision (TPU default matmuls are
    # bf16 — ~1% error, useless for cm-scale neighbor distances).
    # The first query of the tile is as good a center as the mean, and is
    # immune to the zero-padded tail of the last tile skewing it.
    center = q[:, 0:1]  # [3, 1]
    q = q - center
    r = r - center

    # Squared distances via MXU: [TQ, TN]
    cross = jax.lax.dot_general(
        q, r, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    qn = jnp.sum(q * q, axis=0)[:, None]  # [TQ, 1]
    rn = jnp.sum(r * r, axis=0)[None, :]  # [1, TN]
    d2 = jnp.maximum(qn - 2.0 * cross + rn, 0.0)  # [TQ, TN]

    # Mask out zero-padding of the reference set.
    global_col = nt * ref_tile + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2 = jnp.where(global_col < n_real, d2, _BIG)

    @pl.when(nt == 0)
    def _init():
        dist_out[0] = jnp.full_like(dist_out[0], _BIG)
        idx_out[0] = jnp.zeros_like(idx_out[0])

    # Merge the tile into the running top-k with k min-extractions.
    best_d = dist_out[0]  # [TQ, k_pad]
    best_i = idx_out[0]

    d = jnp.concatenate([best_d, d2], axis=1)  # [TQ, k_pad + TN]
    i = jnp.concatenate([best_i, global_col], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)

    new_d = []
    new_i = []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)  # [TQ, 1]
        first = jnp.min(jnp.where(d == m, cols, jnp.int32(2**30)), axis=1, keepdims=True)
        chosen = cols == first
        sel_i = jnp.sum(jnp.where(chosen, i, 0), axis=1, keepdims=True)  # [TQ, 1]
        new_d.append(m)
        new_i.append(sel_i)
        d = jnp.where(chosen, _BIG, d)

    k_pad = best_d.shape[1]
    fill_d = jnp.full((best_d.shape[0], k_pad - k), _BIG, jnp.float32)
    fill_i = jnp.zeros((best_d.shape[0], k_pad - k), jnp.int32)
    dist_out[0] = jnp.concatenate(new_d + [fill_d], axis=1)
    idx_out[0] = jnp.concatenate(new_i + [fill_i], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "query_tile", "ref_tile", "interpret"))
def knn_pallas(
    ref: jax.Array,
    query: jax.Array,
    k: int,
    query_tile: int = 256,
    ref_tile: int = 2048,
    interpret: bool = False,
):
    """Streaming Pallas kNN. ref [B,N,3], query [B,M,3] -> ([B,M,k], [B,M,k]).

    Points are laid out transposed ([3, n]) so the point axis maps to VMEM
    lanes; the cross-term runs on the MXU; the running top-k lives in the
    (revisited) output block across the sequential N-tile grid dimension.
    """
    b, n, _ = ref.shape
    _, m, _ = query.shape

    qpad = (-m) % query_tile
    rpad = (-n) % ref_tile
    # Transpose to [B, 3, n] and zero-pad points.
    q_t = jnp.pad(query.astype(jnp.float32).transpose(0, 2, 1), ((0, 0), (0, 0), (0, qpad)))
    r_t = jnp.pad(ref.astype(jnp.float32).transpose(0, 2, 1), ((0, 0), (0, 0), (0, rpad)))

    mp = m + qpad
    np_ = n + rpad
    k_pad = max(k, 128)  # last-dim alignment for the output block

    grid = (b, mp // query_tile, np_ // ref_tile)

    dist, idx = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, ref_tile=ref_tile, n_real=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 3, query_tile), lambda bi, mi, ni: (bi, 0, mi), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, ref_tile), lambda bi, mi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, query_tile, k_pad), lambda bi, mi, ni: (bi, mi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, query_tile, k_pad), lambda bi, mi, ni: (bi, mi, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, mp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, mp, k_pad), jnp.int32),
        ],
        interpret=interpret,
    )(q_t, r_t)

    return _safe_sqrt(dist[:, :m, :k]), idx[:, :m, :k]


def _knn_kernel_packed(
    q_ref, r_ref, dist_out, idx_out, *, k: int, ref_tile: int, n_real: int, idx_bits: int
):
    """Packed-key streaming kNN kernel (v2).

    Each candidate's squared distance (fp32, non-negative, so its bit
    pattern orders like the float) has its low `idx_bits` mantissa bits
    replaced by the candidate's local column index. A single integer `min`
    then finds BOTH the smallest distance and its index, and a single
    `where` removes it — 2 full-width VPU passes per extraction instead of
    the 5 the unpacked kernel needs (min, tie-break argmin, select, gather,
    null). The truncation costs ~2^-(23-idx_bits) relative distance
    precision; callers recompute exact distances for the k winners.
    """
    nt = pl.program_id(2)
    q = q_ref[0]  # [3, TQ]
    r = r_ref[0]  # [3, TN]

    # Query-centering + HIGHEST precision: see _knn_kernel.
    center = q[:, 0:1]
    q = q - center
    r = r - center
    cross = jax.lax.dot_general(
        q, r, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    qn = jnp.sum(q * q, axis=0)[:, None]
    rn = jnp.sum(r * r, axis=0)[None, :]
    d2 = jnp.maximum(qn - 2.0 * cross + rn, 0.0)  # [TQ, TN]

    local_col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    valid = (nt * ref_tile + local_col) < n_real

    # Sentinel: huge finite float with zero low bits (NOT 0x7FFFFFFF, whose
    # high bits decode to NaN and would poison the merge mins).
    bigkey = jnp.int32(0x7F000000)
    mask_hi = jnp.int32(-1) << idx_bits
    bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
    key = (bits & mask_hi) | local_col
    key = jnp.where(valid, key, bigkey)

    @pl.when(nt == 0)
    def _init():
        dist_out[0] = jnp.full_like(dist_out[0], _BIG)
        idx_out[0] = jnp.zeros_like(idx_out[0])

    # Tile-local top-k: 2 passes per extraction.
    picks = []
    for _ in range(k):
        m = jnp.min(key, axis=1, keepdims=True)  # [TQ, 1]
        picks.append(m)
        key = jnp.where(key == m, bigkey, key)
    kcat = jnp.concatenate(picks, axis=1)  # [TQ, k]
    local = kcat & ~mask_hi
    d_ap = jax.lax.bitcast_convert_type(kcat & mask_hi, jnp.float32)  # truncated d2
    g_idx = nt * ref_tile + local

    # Merge the k tile winners into the running best (small width: k_pad+k).
    best_d = dist_out[0]  # [TQ, k_pad] truncated squared dists
    best_i = idx_out[0]
    d = jnp.concatenate([best_d, d_ap], axis=1)
    i = jnp.concatenate([best_i, g_idx], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    new_d, new_i = [], []
    for _ in range(k):
        m = jnp.min(d, axis=1, keepdims=True)
        first = jnp.min(jnp.where(d == m, cols, jnp.int32(2**30)), axis=1, keepdims=True)
        chosen = cols == first
        new_d.append(m)
        new_i.append(jnp.sum(jnp.where(chosen, i, 0), axis=1, keepdims=True))
        d = jnp.where(chosen, _BIG, d)
    k_pad = best_d.shape[1]
    fill_d = jnp.full((best_d.shape[0], k_pad - k), _BIG, jnp.float32)
    fill_i = jnp.zeros((best_d.shape[0], k_pad - k), jnp.int32)
    dist_out[0] = jnp.concatenate(new_d + [fill_d], axis=1)
    idx_out[0] = jnp.concatenate(new_i + [fill_i], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "query_tile", "ref_tile", "interpret"))
def knn_pallas_packed(
    ref: jax.Array,
    query: jax.Array,
    k: int,
    query_tile: int = 256,
    ref_tile: int = 2048,
    interpret: bool = False,
):
    """Packed-key streaming kNN (see _knn_kernel_packed).

    Returned distances carry the packing truncation: squared distances lose
    their low ceil(log2(ref_tile)) mantissa bits, i.e. <= 2^-12 relative
    error on the distance at the default tile — far below the fp32 noise of
    the distance computation itself and irrelevant to every consumer in
    this repo (the tracker uses only the indices,
    `models/mvtracker.py:239,328`). Near-exact ties may order differently
    than exact top-k. No XLA post-pass: recomputing exact distances +
    re-sorting outside the kernel measured MORE expensive than the kernel
    speedup it protected (15 ms/fwd of gathers at the flagship shapes)."""
    b, n, _ = ref.shape
    _, m, _ = query.shape
    idx_bits = max((ref_tile - 1).bit_length(), 1)

    qpad = (-m) % query_tile
    rpad = (-n) % ref_tile
    q_t = jnp.pad(query.astype(jnp.float32).transpose(0, 2, 1), ((0, 0), (0, 0), (0, qpad)))
    r_t = jnp.pad(ref.astype(jnp.float32).transpose(0, 2, 1), ((0, 0), (0, 0), (0, rpad)))

    mp = m + qpad
    np_ = n + rpad
    k_pad = max(k, 128)
    grid = (b, mp // query_tile, np_ // ref_tile)

    dist, idx = pl.pallas_call(
        functools.partial(
            _knn_kernel_packed, k=k, ref_tile=ref_tile, n_real=n, idx_bits=idx_bits
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 3, query_tile), lambda bi, mi, ni: (bi, 0, mi), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, ref_tile), lambda bi, mi, ni: (bi, 0, ni), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, query_tile, k_pad), lambda bi, mi, ni: (bi, mi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, query_tile, k_pad), lambda bi, mi, ni: (bi, mi, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, mp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, mp, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q_t, r_t)

    return _safe_sqrt(dist[:, :m, :k]), idx[:, :m, :k]


def _knn_kernel_fused(
    q_ref, r_ref, dist_out, idx_out, best_d_ref, best_i_ref,
    *, k: int, chunk: int, n_real: int, idx_bits: int, n_chunks: int,
):
    """Single-invocation packed-key kNN: the whole reference set for this
    (batch, query-tile) cell is resident (r_ref [3, N_pad]); an internal
    fori_loop streams it in `chunk`-wide slices, so the launch overhead of
    a sequential grid dimension (~20 us x n_tiles per cell, the dominant
    cost of the v2 kernel at flagship shapes) is paid once per cell."""
    q = q_ref[0]  # [3, TQ]
    center = q[:, 0:1]
    q = q - center

    tq = q.shape[1]
    best_d_ref[...] = jnp.full_like(best_d_ref, _BIG)
    best_i_ref[...] = jnp.zeros_like(best_i_ref)

    bigkey = jnp.int32(0x7F000000)
    mask_hi = jnp.int32(-1) << idx_bits
    qn = jnp.sum(q * q, axis=0)[:, None]  # [TQ, 1]

    def body(c, _):
        r = r_ref[0, :, pl.dslice(c * chunk, chunk)] - center  # [3, chunk]
        cross = jax.lax.dot_general(
            q, r, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        rn = jnp.sum(r * r, axis=0)[None, :]
        d2 = jnp.maximum(qn - 2.0 * cross + rn, 0.0)  # [TQ, chunk]

        local_col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        valid = (c * chunk + local_col) < n_real
        bits = jax.lax.bitcast_convert_type(d2, jnp.int32)
        key = jnp.where(valid, (bits & mask_hi) | local_col, bigkey)

        picks = []
        for _ in range(k):
            m = jnp.min(key, axis=1, keepdims=True)
            picks.append(m)
            key = jnp.where(key == m, bigkey, key)
        kcat = jnp.concatenate(picks, axis=1)  # [TQ, k]
        d_ap = jax.lax.bitcast_convert_type(kcat & mask_hi, jnp.float32)
        g_idx = c * chunk + (kcat & ~mask_hi)

        d = jnp.concatenate([best_d_ref[...], d_ap], axis=1)
        i = jnp.concatenate([best_i_ref[...], g_idx], axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        new_d, new_i = [], []
        for _ in range(k):
            m = jnp.min(d, axis=1, keepdims=True)
            first = jnp.min(
                jnp.where(d == m, cols, jnp.int32(2**30)), axis=1, keepdims=True
            )
            chosen = cols == first
            new_d.append(m)
            new_i.append(jnp.sum(jnp.where(chosen, i, 0), axis=1, keepdims=True))
            d = jnp.where(chosen, _BIG, d)
        k_pad = best_d_ref.shape[1]
        fill_d = jnp.full((tq, k_pad - k), _BIG, jnp.float32)
        fill_i = jnp.zeros((tq, k_pad - k), jnp.int32)
        best_d_ref[...] = jnp.concatenate(new_d + [fill_d], axis=1)
        best_i_ref[...] = jnp.concatenate(new_i + [fill_i], axis=1)
        return ()

    jax.lax.fori_loop(0, n_chunks, body, (), unroll=False)
    dist_out[0] = best_d_ref[...]
    idx_out[0] = best_i_ref[...]


@functools.partial(jax.jit, static_argnames=("k", "query_tile", "chunk", "interpret"))
def knn_pallas_fused(
    ref: jax.Array,
    query: jax.Array,
    k: int,
    query_tile: int = 256,
    chunk: int = 4096,
    interpret: bool = False,
):
    """Packed-key kNN with the ref-chunk loop inside the kernel (v3).

    Same truncated-distance contract as :func:`knn_pallas_packed`. Grid is
    (B, M_tiles) — every grid cell is independent ("parallel"), and the
    whole ref set sits in VMEM once per cell ([3, N] fp32, i.e. 12 B/point:
    fine for the <=100k-point fused clouds this tracker builds)."""
    b, n, _ = ref.shape
    _, m, _ = query.shape
    idx_bits = max((chunk - 1).bit_length(), 1)

    qpad = (-m) % query_tile
    rpad = (-n) % chunk
    q_t = jnp.pad(query.astype(jnp.float32).transpose(0, 2, 1), ((0, 0), (0, 0), (0, qpad)))
    r_t = jnp.pad(ref.astype(jnp.float32).transpose(0, 2, 1), ((0, 0), (0, 0), (0, rpad)))

    mp = m + qpad
    np_ = n + rpad
    k_pad = max(k, 128)
    grid = (b, mp // query_tile)

    dist, idx = pl.pallas_call(
        functools.partial(
            _knn_kernel_fused, k=k, chunk=chunk, n_real=n, idx_bits=idx_bits,
            n_chunks=np_ // chunk,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 3, query_tile), lambda bi, mi: (bi, 0, mi), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 3, np_), lambda bi, mi: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, query_tile, k_pad), lambda bi, mi: (bi, mi, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, query_tile, k_pad), lambda bi, mi: (bi, mi, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, mp, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, mp, k_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((query_tile, k_pad), jnp.float32),
            pltpu.VMEM((query_tile, k_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q_t, r_t)

    return _safe_sqrt(dist[:, :m, :k]), idx[:, :m, :k]


def knn(ref: jax.Array, query: jax.Array, k: int, backend: str = "auto"):
    """Batched kNN dispatch; mirrors the reference's `knn()` contract
    (`mvtracker/mvtracker.py:26-90`): returns (dists [B,M,k], idx [B,M,k]),
    sorted by ascending distance.

    backend="auto" picks the Pallas streaming kernel on TPU (measured ~10x
    faster than matmul+lax.top_k at the tracker's level-0 shapes) and the
    XLA path elsewhere (Pallas needs interpret mode off-TPU).
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() not in ("cpu", "gpu") else "xla"
    if backend == "xla":
        return knn_xla(ref, query, k)
    if backend == "pallas":
        # Default: the fused packed-key kernel (v3 — internal ref loop, one
        # launch per query tile, whole padded cloud VMEM-resident) measures
        # fastest at the tracker's shapes; it superseded the v1/v2 kernels,
        # which remain callable directly (and as the large-cloud fallback
        # below). The chunk adapts downward for small clouds — the kernel
        # pads the ref set to a chunk multiple, so a 4096 chunk would
        # stream 4x dead width for a 1024-point pyramid level.
        n = ref.shape[1]
        # VMEM guard: the fused kernel pins the padded cloud ([8 sublanes x
        # n x 4 B] after layout padding) in VMEM per grid cell. Past ~256k
        # points (~8 MB) that no longer fits alongside the query/output
        # blocks; use the v2 kernel, which streams ref tiles through the
        # grid instead.
        if n > 256 * 1024:
            return knn_pallas_packed(ref, query, k)
        chunk = 4096 if n >= 4096 else max(512, 1 << (n - 1).bit_length())
        return knn_pallas_fused(ref, query, k, chunk=chunk)
    if backend == "pallas_interpret":
        # The TPU kernel under the Pallas interpreter: runs anywhere (CPU
        # meshes included), so the SPMD-partitioner x pallas_call
        # interaction of the sharded step is testable without N chips.
        n = ref.shape[1]
        chunk = 4096 if n >= 4096 else max(512, 1 << (n - 1).bit_length())
        return knn_pallas_fused(ref, query, k, chunk=chunk, interpret=True)
    if backend == "pallas_packed":
        return knn_pallas_packed(ref, query, k)
    if backend == "reference":
        return knn_reference(ref, query, k)
    raise ValueError(f"unknown knn backend: {backend}")


# ---------------------------------------------------------------------------
# Distributed kNN over a device-sharded cloud
# ---------------------------------------------------------------------------


def knn_sharded(
    ref_local: jax.Array,
    query: jax.Array,
    k: int,
    axis_name: str,
    backend: str = "auto",
):
    """kNN when the reference cloud is sharded across a mesh axis.

    Inside `shard_map` over `axis_name`: each device holds a cloud shard
    `ref_local` [B, N/D, 3] and the full (replicated) query set. Strategy:
    per-shard local top-k, then an all-gather of the k*D candidates and a
    final merge — O(k*D) interconnect traffic per query instead of
    all-gathering the full cloud (SURVEY §2.6: "all-gather of the fused
    cloud ... or distributed top-k merge").

    Returns (dists [B, M, k], GLOBAL indices [B, M, k]).
    """
    n_local = ref_local.shape[1]
    shard_idx = jax.lax.axis_index(axis_name)

    d_loc, i_loc = knn(ref_local, query, k, backend=backend)
    i_glob = i_loc + shard_idx * n_local

    # Gather every shard's candidates: [D, B, M, k] -> merge on each device.
    d_all = jax.lax.all_gather(d_loc, axis_name)  # [D, B, M, k]
    i_all = jax.lax.all_gather(i_glob, axis_name)
    d_cat = jnp.moveaxis(d_all, 0, -2).reshape(*d_loc.shape[:-1], -1)  # [B, M, D*k]
    i_cat = jnp.moveaxis(i_all, 0, -2).reshape(*i_loc.shape[:-1], -1)

    neg_d, sel = jax.lax.top_k(-d_cat, k)
    return -neg_d, jnp.take_along_axis(i_cat, sel, axis=-1)


def knn_sharded_ring(
    ref_local: jax.Array,
    query: jax.Array,
    k: int,
    axis_name: str,
    backend: str = "auto",
):
    """Ring-scheduled distributed kNN over a device-sharded cloud.

    The alternative collective schedule to :func:`knn_sharded` (SURVEY §2.6:
    "all-gather of the fused cloud ... or collective-permute ring"):
    instead of all-gathering every shard's k candidates at once, cloud
    shards rotate around the mesh axis with `ppermute`; each device folds
    the visiting shard's local top-k into a running best. Per-step
    interconnect traffic is one cloud shard (N/D * 12 B) on a neighbor link,
    so the ring pipelines compute against ICI transfers and never forms the
    [D, B, M, k] gather buffer — preferable when M*k (query candidates)
    outweighs N/D (shard size); the all-gather merge wins in the opposite
    regime.

    Measured (scripts/profile_sharded_knn.py, 8-device CPU mesh, k=16):
    the 'ring wins iff M*k > N/D' predictor matched the winner on 4/4
    configs spanning N 16k-131k x M 256-4096, with thin margins (1-2%) on
    CPU where a "link" is a memcpy; on ICI the traffic asymmetry (ring
    moves N/D*12 B per step on neighbor links vs the gather's D*M*k*8 B
    fan-in) widens the same split. Default remains `knn_sharded` (gather):
    the tracker's regime is M*k ~ 4k-16k candidates vs N/D >= 16k shard
    points, squarely gather-side.

    Inside `shard_map` over `axis_name`: `ref_local` [B, N/D, 3] sharded,
    `query` [B, M, 3] replicated. Returns (dists, GLOBAL indices) [B, M, k].
    """
    d = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    n_local = ref_local.shape[1]
    perm = [(i, (i + 1) % d) for i in range(d)]

    b, m, _ = query.shape
    best_d = jnp.full((b, m, k), _BIG, jnp.float32)
    best_i = jnp.zeros((b, m, k), jnp.int32)
    shard = ref_local

    for step in range(d):
        owner = (my - step) % d  # which shard this device holds right now
        d_loc, i_loc = knn(shard, query, k, backend=backend)
        i_glob = i_loc + owner * n_local
        d_cat = jnp.concatenate([best_d, d_loc], axis=-1)
        i_cat = jnp.concatenate([best_i, i_glob], axis=-1)
        neg_d, sel = jax.lax.top_k(-d_cat, k)
        best_d = -neg_d
        best_i = jnp.take_along_axis(i_cat, sel, axis=-1)
        if step + 1 < d:
            shard = jax.lax.ppermute(shard, axis_name, perm)

    return best_d, best_i
