"""Flagship train-step budget breakdown (round-3 verdict #6).

BENCH_r03 published train_step_ms_flagship = 440 ms against a 93 ms
forward with no accounting of where the other ~350 ms goes. This script
measures it by ablation (the scan-loop methodology from
profile_components.py — call-by-call timing is RTT-dominated over the
tunneled backend):

  full            the bench's exact train step (remat, iters=4)
  no_remat        remat off (isolates the recompute cost; may OOM at the
                  full shapes — reported as such)
  no_corr_bwd     cloud features stop-gradiented entering correlation
                  (isolates the corr gather/scatter backward)
  no_enc_bwd      feature maps stop-gradiented after the encoder
                  (isolates encoder backward + its remat recompute)
  fwd_loss_only   forward + loss without value_and_grad (the irreducible
                  forward cost inside the step)

    python scripts/profile_train_step.py            # bench shapes
    python scripts/profile_train_step.py --small    # CPU-sized smoke
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true", help="tiny shapes (CPU smoke)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (the container default is "
                        "the tunneled TPU; env vars alone are too late "
                        "because sitecustomize pre-imports jax)")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--out_json", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from __graft_entry__ import _make_scene
    from mvtracker_tpu.models.mvtracker import MVTracker
    from mvtracker_tpu.ops import corr as corr_ops
    from mvtracker_tpu.training import step as step_lib

    if args.small:
        v, t, h, w, n = 2, 12, 64, 64, 32
        model_kw = dict(
            sliding_window_len=8, fmaps_dim=64, num_heads=6, hidden_size=192,
            space_depth=3, time_depth=3, num_virtual_tracks=16,
            corr_n_levels=3, corr_neighbors=8, compute_dtype="bfloat16",
        )
        iters = 3
    else:
        v, t, h, w, n = 4, 24, 256, 256, 256
        model_kw = dict(compute_dtype="bfloat16")
        iters = 4

    rng = np.random.default_rng(0)
    scene = _make_scene(rng, v, t, h, w, n)
    batch = {
        "rgbs": scene[0][None], "depths": scene[1][None],
        "query_points": scene[2][None], "intrs": scene[3][None],
        "extrs": scene[4][None],
        "traj_gt": rng.normal(size=(1, t, n, 3)).astype(np.float32),
        "vis_gt": np.ones((1, t, n), np.float32),
        "valid": np.ones((1, t, n), np.float32),
    }
    batch = jax.tree.map(jax.device_put, batch)
    optimizer = step_lib.make_optimizer(total_steps=1000)
    example = {k: val[0] for k, val in batch.items()}

    def timed(step_fn, state):
        s, m = step_fn(state, batch)
        float(m["loss"])  # compile + sync

        def run(reps):
            s2 = state
            t0 = time.perf_counter()
            for _ in range(reps):
                s2, m2 = step_fn(s2, batch)
            float(m2["loss"])
            return (time.perf_counter() - t0) / reps

        run(2)
        return min(run(args.reps), run(args.reps)) * 1e3

    results = {}

    def variant(name, model, fwd_only=False):
        try:
            state = step_lib.init_state(
                model, optimizer, example, jax.random.PRNGKey(0), iters=iters
            )
            if fwd_only:
                @jax.jit
                def step_fn(st, b):
                    def one(sc):
                        return step_lib.scene_loss(
                            model, st.params, sc, iters, 0.8, 0.1
                        )
                    totals, parts = jax.vmap(one)(b)
                    return st, {"loss": jnp.mean(totals)}
            else:
                step_fn = step_lib.make_train_step(model, optimizer, iters=iters)
            ms = timed(step_fn, state)
            results[name] = round(ms, 2)
            print(f"{name:<16} {ms:8.2f} ms", flush=True)
        except Exception as e:  # OOM etc.
            results[name] = f"failed: {type(e).__name__}"
            print(f"{name:<16} failed: {e}", flush=True)

    base = MVTracker(**model_kw, remat=True)
    variant("full", base)
    variant("fwd_loss_only", base, fwd_only=True)
    variant("no_remat", MVTracker(**model_kw, remat=False))
    # Selective remat: transformer rematerialized, encoder fmaps saved
    # (round-5 fix candidate: the encoder runs ONCE for the whole video
    # and its output is ~100 MB at these shapes, but remat re-runs the
    # conv stack in the backward — measured 134 ms of the 440 ms step).
    variant("remat_no_encoder", MVTracker(**model_kw, remat=True,
                                          remat_encoder=False))

    # Ablate the correlation backward: stop gradients into the cloud
    # features (and targets) at the corr_sample boundary.
    orig_corr = corr_ops.corr_sample

    def corr_nograd(cloud_xyz, cloud_fvec, targets, coords, idx, **kw):
        return orig_corr(
            cloud_xyz,
            jax.lax.stop_gradient(cloud_fvec),
            jax.lax.stop_gradient(targets),
            coords, idx, **kw,
        )

    corr_ops.corr_sample = corr_nograd
    try:
        variant("no_corr_bwd", base)
    finally:
        corr_ops.corr_sample = orig_corr

    # Ablate the encoder backward (and its remat recompute): stop
    # gradients on the feature maps.
    orig_fmaps = MVTracker.compute_fmaps
    MVTracker.compute_fmaps = lambda self, rgbs: jax.lax.stop_gradient(
        orig_fmaps(self, rgbs)
    )
    try:
        variant("no_enc_bwd", base)
    finally:
        MVTracker.compute_fmaps = orig_fmaps

    print(json.dumps(results))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
