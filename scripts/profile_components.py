"""Per-component on-chip timing for the flagship forward.

Times each stage of the MVTracker forward separately (encoder, cloud build,
feature init, kNN, fused correlation, update transformer, full forward) at
the bench config, so optimization effort goes where the time is.

Timing discipline per NOTES.md: sync via scalar fetch (block_until_ready is
unreliable over the tunneled backend), amortize RTT over many reps.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, reps=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.reshape(-1)[0])
    return (time.perf_counter() - t0) / reps


def timed_scan(step_fn, carry0, inner=64, reps=3):
    """Time a small op by scanning it `inner` times inside ONE jit call.

    `step_fn(carry) -> carry` must thread a data dependency through the op
    so XLA cannot elide iterations. Removes the per-dispatch tunnel RTT that
    dominates sub-10ms ops when timed call-by-call.
    """
    import jax

    @jax.jit
    def loop(carry):
        return jax.lax.scan(lambda c, _: (step_fn(c), None), carry, None, length=inner)[0]

    carry = loop(carry0)
    float(jax.tree.leaves(carry)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = loop(carry)
    float(jax.tree.leaves(carry)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / (reps * inner)


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _make_scene
    from mvtracker_tpu.models.mvtracker import MVTracker
    from mvtracker_tpu.ops import corr as corr_ops
    from mvtracker_tpu.ops import knn as knn_ops

    v, t, h, w, n = 4, 24, 256, 256, 256
    rng = np.random.default_rng(0)
    model = MVTracker(compute_dtype="bfloat16")
    args = tuple(jax.device_put(a) for a in _make_scene(rng, v, t, h, w, n))
    rgbs, depths, query, intrs, extrs = args
    params = jax.jit(lambda k, *a: model.init(k, *a, iters=4))(jax.random.PRNGKey(0), *args)

    s = model.sliding_window_len
    starts = list(range(0, max(t - s // 2, 1), s // 2))
    n_wind = len(starts)
    n_iters = 4
    lvls = model.corr_n_levels
    report = {}

    # --- full forward ---
    @jax.jit
    def full_fwd(params, *a):
        out = model.apply(params, *a, iters=4)
        return out["traj"], out["vis"]

    report["full_forward"] = timed(full_fwd, (params, *args), reps=10)

    # --- encoder over all V*T frames ---
    @jax.jit
    def enc(params, rgbs):
        return model.apply(params, rgbs, method=MVTracker.compute_fmaps)

    report["encoder"] = timed(enc, (params, rgbs))
    fmaps = enc(params, rgbs)

    # --- context build (4-level clouds) ---
    depths_strided = depths[:, :, :: model.stride, :: model.stride]

    @jax.jit
    def ctx(params, fmaps, depths_strided, intrs, extrs):
        return model.apply(
            params, fmaps, depths_strided, intrs, extrs, method=MVTracker._build_context
        )

    report["build_context"] = timed(ctx, (params, fmaps, depths_strided, intrs, extrs))
    context = ctx(params, fmaps, depths_strided, intrs, extrs)

    # --- feat init ---
    qt = query[:, 0].astype(jnp.int32)
    qxyz = query[:, 1:]

    @jax.jit
    def finit(params, context, qt, qxyz):
        return model.apply(params, context, qt, qxyz, method=MVTracker._feat_init)

    report["feat_init"] = timed(finit, (params, context, qt, qxyz))

    # --- one window's kNN (all levels) and fused corr, x (iters*windows) ---
    context_w = jax.tree.map(lambda a: a[:s], context)
    coords = jnp.broadcast_to(qxyz[None], (s, n, 3)).astype(jnp.float32)
    ffeats = jnp.zeros((s, n, model.fmaps_dim), jnp.float32)

    def knn_step(coords_c):
        dsum = 0.0
        for lvl in range(lvls):
            xyz_l = context_w[lvl][0]
            d, _ = knn_ops.knn(xyz_l, coords_c, model.corr_neighbors, backend="auto")
            dsum = dsum + d[..., :1] * 0.0
        return coords_c + dsum

    per_call = timed_scan(knn_step, coords)
    report["knn_4lvl_per_window_iter"] = per_call
    report["knn_total_est"] = per_call * n_iters * n_wind

    @jax.jit
    def knn_all_levels(context_w, coords):
        outs = []
        for lvl in range(lvls):
            xyz_l = context_w[lvl][0]
            _, idx = knn_ops.knn(xyz_l, coords, model.corr_neighbors, backend="auto")
            outs.append(idx)
        return outs

    idxs = knn_all_levels(context_w, coords)

    def corr_step(ffeats_c):
        outs = []
        for lvl in range(lvls):
            xyz_l, fvec_l = context_w[lvl][0], context_w[lvl][1]
            fc = corr_ops.corr_sample(
                xyz_l, fvec_l, ffeats_c, coords, idxs[lvl],
                groups=model.corr_n_groups,
                add_neighbor_offset=model.corr_add_neighbor_offset,
                add_neighbor_xyz=model.corr_add_neighbor_xyz,
            )
            outs.append(fc.reshape(s, n, -1))
        fcorrs = jnp.concatenate(outs, axis=-1)
        return ffeats_c + fcorrs[..., : model.fmaps_dim] * 0.0

    per_call = timed_scan(corr_step, ffeats)
    report["corr_4lvl_per_window_iter"] = per_call
    report["corr_total_est"] = per_call * n_iters * n_wind

    # --- update transformer, x (iters*windows) ---
    d_in = model.updateformer_input_dim
    x_uf = jnp.zeros((1, n, s, d_in), jnp.float32)
    active = jnp.ones((1, n), bool)
    uf_params = {"params": params["params"]["updateformer"]}
    from mvtracker_tpu.models.updateformer import EfficientUpdateFormer

    uf_mod = EfficientUpdateFormer(
        space_depth=model.space_depth,
        time_depth=model.time_depth,
        input_dim=d_in,
        hidden_size=model.hidden_size,
        num_heads=model.num_heads,
        output_dim=3 + model.fmaps_dim,
        mlp_ratio=4.0,
        add_space_attn=model.add_space_attn,
        num_virtual_tracks=model.num_virtual_tracks,
        dtype=jnp.bfloat16,
    )

    x_uf = jnp.ones_like(x_uf)

    def uf_step(x_c):
        delta = uf_mod.apply(uf_params, x_c, track_mask=active)  # [1,N,S,3+C]
        return x_c + jnp.mean(delta) * 0.0

    per_call = timed_scan(uf_step, x_uf, inner=32)
    report["updateformer_per_window_iter"] = per_call
    report["updateformer_total_est"] = per_call * n_iters * n_wind

    # encoder re-timed with the in-graph loop for consistency
    def enc_step(r):
        f = model.apply(params, r, method=MVTracker.compute_fmaps)
        return r + jnp.mean(f) * 0.0

    report["encoder_scan"] = timed_scan(enc_step, rgbs, inner=8, reps=2)

    accounted = (
        report["encoder"]
        + report["build_context"]
        + report["feat_init"]
        + report["knn_total_est"]
        + report["corr_total_est"]
        + report["updateformer_total_est"]
    )
    report["accounted"] = accounted
    report["windows"] = n_wind

    print(f"\n== component timing (v={v} t={t} {h}x{w} n={n}; {n_wind} windows x {n_iters} iters) ==")
    for k, val in report.items():
        if k == "windows":
            continue
        pct = 100.0 * val / report["full_forward"]
        print(f"{k:32s} {val * 1e3:9.2f} ms   {pct:5.1f}% of full fwd")


if __name__ == "__main__":
    main()
