"""Batched-scene serving: where does vmap lose to sequential dispatch?

Round-4 published value_batched8 = 84.9k aggregate pf/s *below* the
batch-1 serving value 91.8k — vmap-batching B scenes is SLOWER per scene
than dispatching them one after another (the bench's batch-1 loop already
pipelines dispatches, so 91.8k IS the sequential-aggregate number).
This script measures WHY, per component: for B in 1..8 it times the
vmapped serving forward and each stage (encoder, kNN, fused correlation,
update transformer) and reports the scaling ratio

    r(B) = time(B) / (B * time(1))

r(B) ~ 1.0 means the stage is pure serial work (a v5e has ONE TensorCore:
grid/batch dimensions execute sequentially, so B scenes are B units of
work no matter how they are batched); r(B) > 1.0 means vmap actively
loses efficiency (layout/fusion regressions); r(B) < 1.0 would mean the
stage was underfilling the chip at B=1 and batching recovers idle
capacity — the hypothesis the round-3 verdict wanted tested.

    python scripts/profile_batched_serving.py --out_json RESULTS_r5_batched.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, reps=8, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.reshape(-1)[0])

    def run(r):
        t0 = time.perf_counter()
        for _ in range(r):
            out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        float(leaf.reshape(-1)[0])
        return (time.perf_counter() - t0) / r

    return min(run(reps), run(reps))


def timed_scan(step_fn, carry0, inner=32, reps=3, consts=()):
    """Scan-loop timing. Large arrays the step reads must go through
    `consts` (jit PARAMETERS), not closure capture — captured device
    arrays serialize as HLO constants and the tunneled remote-compile
    endpoint rejects multi-hundred-MB request bodies (HTTP 413)."""
    import jax

    @jax.jit
    def loop(carry, consts):
        return jax.lax.scan(
            lambda c, _: (step_fn(c, *consts), None), carry, None, length=inner
        )[0]

    carry = loop(carry0, consts)
    float(jax.tree.leaves(carry)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        carry = loop(carry, consts)
    float(jax.tree.leaves(carry)[0].reshape(-1)[0])
    return (time.perf_counter() - t0) / (reps * inner)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--small", action="store_true")
    p.add_argument("--out_json", default=None)
    args_cli = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args_cli.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _make_scene
    from mvtracker_tpu.models.mvtracker import MVTracker
    from mvtracker_tpu.ops import corr as corr_ops
    from mvtracker_tpu.ops import knn as knn_ops

    if args_cli.small:
        v, t, h, w, n = 2, 8, 64, 64, 32
        model = MVTracker(
            sliding_window_len=8, fmaps_dim=32, num_heads=2, hidden_size=64,
            space_depth=2, time_depth=2, num_virtual_tracks=8,
            corr_n_levels=2, corr_neighbors=4, corr_knn_reuse=True,
            compute_dtype="bfloat16",
        )
    else:
        v, t, h, w, n = 4, 24, 256, 256, 256
        model = MVTracker(compute_dtype="bfloat16", corr_knn_reuse=True)

    rng = np.random.default_rng(0)
    scene = _make_scene(rng, v, t, h, w, n)
    args1 = tuple(jax.device_put(a) for a in scene)
    rgbs, depths, query, intrs, extrs = args1
    params = jax.jit(lambda k, *a: model.init(k, *a, iters=4))(
        jax.random.PRNGKey(0), *args1
    )

    s = model.sliding_window_len
    lvls = model.corr_n_levels
    report = {"config": [v, t, h, w, n], "batches": {}}

    # Single-scene stage inputs reused across batch sizes.
    @jax.jit
    def enc1(params, rgbs):
        return model.apply(params, rgbs, method=MVTracker.compute_fmaps)

    fmaps1 = enc1(params, rgbs)
    depths_strided1 = depths[:, :, :: model.stride, :: model.stride]

    @jax.jit
    def ctx1(params, fmaps, dstr, intrs, extrs):
        return model.apply(params, fmaps, dstr, intrs, extrs,
                           method=MVTracker._build_context)

    context1 = ctx1(params, fmaps1, depths_strided1, intrs, extrs)
    context_w1 = jax.tree.map(lambda a: a[:s], context1)
    qxyz = query[:, 1:]
    coords1 = jnp.broadcast_to(qxyz[None], (s, n, 3)).astype(jnp.float32)
    ffeats1 = jnp.zeros((s, n, model.fmaps_dim), jnp.float32)

    for b in args_cli.batches:
        row = {}

        def bput(a):
            return jax.device_put(jnp.stack([jnp.asarray(a)] * b))

        bargs = tuple(bput(a) for a in args1)

        # Full serving forward under vmap (exactly the bench's field).
        @jax.jit
        def fwd_b(params, *ba):
            out = jax.vmap(lambda *sc: model.apply(params, *sc, iters=4))(*ba)
            return out["traj"], out["vis"]

        row["full_fwd"] = timed(fwd_b, (params, *bargs), reps=6)

        # Encoder under vmap.
        @jax.jit
        def enc_b(params, brgbs):
            return jax.vmap(
                lambda r: model.apply(params, r, method=MVTracker.compute_fmaps)
            )(brgbs)

        row["encoder"] = timed(enc_b, (params, bput(rgbs)))

        # kNN (one window, all levels) under vmap.
        context_wb = jax.tree.map(bput, context_w1)
        coords_b = bput(coords1)

        def knn_step(coords_c, ctxs):
            def one(ctx_w, cc):
                dsum = 0.0
                for lvl in range(lvls):
                    xyz_l = ctx_w[lvl][0]
                    d, _ = knn_ops.knn(
                        xyz_l, cc, model.corr_k(lvl), backend="auto"
                    )
                    dsum = dsum + d[..., :1] * 0.0
                return cc + dsum

            return jax.vmap(one)(ctxs, coords_c)

        row["knn_window"] = timed_scan(knn_step, coords_b, inner=16,
                                       consts=(context_wb,))

        # Fused correlation under vmap (fixed kNN indices).
        @jax.jit
        def knn_idx(ctx_w, cc):
            def one(cw, c):
                return [
                    knn_ops.knn(cw[lvl][0], c, model.corr_k(lvl),
                                backend="auto")[1]
                    for lvl in range(lvls)
                ]
            return jax.vmap(one)(ctx_w, cc)

        idxs_b = knn_idx(context_wb, coords_b)
        ffeats_b = bput(ffeats1)

        def corr_step(ffeats_c, ctxs, idxs_all, coords_all):
            def one(ctx_w, idxs, ff, cc):
                outs = []
                for lvl in range(lvls):
                    fc = corr_ops.corr_sample(
                        ctx_w[lvl][0], ctx_w[lvl][1], ff, cc, idxs[lvl],
                        groups=model.corr_n_groups,
                        add_neighbor_offset=model.corr_add_neighbor_offset,
                        add_neighbor_xyz=model.corr_add_neighbor_xyz,
                    )
                    outs.append(fc.reshape(s, n, -1))
                fcorrs = jnp.concatenate(outs, axis=-1)
                return ff + fcorrs[..., : model.fmaps_dim] * 0.0

            return jax.vmap(one, in_axes=(0, 0, 0, 0))(
                ctxs, idxs_all, ffeats_c, coords_all
            )

        row["corr_window"] = timed_scan(corr_step, ffeats_b, inner=16,
                                        consts=(context_wb, idxs_b, coords_b))

        # Update transformer under vmap (same standalone-module pattern as
        # profile_components.py).
        from mvtracker_tpu.models.updateformer import EfficientUpdateFormer

        d_in = model.updateformer_input_dim
        uf_params = {"params": params["params"]["updateformer"]}
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
        xb_uf = jnp.ones((b, 1, n, s, d_in), jnp.float32)
        active = jnp.ones((1, n), bool)

        def uf_step(x_c, ufp):
            def one(x):
                delta = uf_mod.apply(ufp, x, track_mask=active)
                return x + jnp.mean(delta) * 0.0
            return jax.vmap(one)(x_c)

        row["updateformer"] = timed_scan(uf_step, xb_uf, inner=16,
                                         consts=(uf_params,))

        report["batches"][b] = {
            k: (round(val * 1e3, 3) if isinstance(val, float) else val)
            for k, val in row.items()
        }
        print(b, report["batches"][b], flush=True)

    # Scaling ratios vs B=1.
    if 1 in report["batches"]:
        base = report["batches"][1]
        report["scaling_ratio"] = {
            str(b): {
                k: round(report["batches"][b][k] / (b * base[k]), 3)
                for k in base
                if isinstance(base[k], float)
                and isinstance(report["batches"][b][k], float)
            }
            for b in args_cli.batches
        }
    print(json.dumps(report))
    if args_cli.out_json:
        with open(args_cli.out_json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
