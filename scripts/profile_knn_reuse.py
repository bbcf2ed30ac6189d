"""A/B the corr_knn_reuse fast path on chip: throughput + output divergence.

corr_knn_reuse performs one kNN per window (at the initial coords — identical
to what iteration 0 searches anyway) and reuses the neighbor set across all
refinement iterations, cutting the kNN budget ~iters-fold. This script
measures, at the headline bench config:

  1. median forward step time, exact vs reuse;
  2. coordinate divergence between the two paths (same params/inputs).

Run on the TPU chip: `python scripts/profile_knn_reuse.py`
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _make_scene
    from mvtracker_tpu.models.mvtracker import MVTracker

    v, t, h, w, n = 4, 24, 256, 256, 256
    rng = np.random.default_rng(0)
    args = tuple(jax.device_put(a) for a in _make_scene(rng, v, t, h, w, n))

    model_exact = MVTracker(compute_dtype="bfloat16")
    model_reuse = MVTracker(compute_dtype="bfloat16", corr_knn_reuse=True)
    params = jax.jit(lambda k, *a: model_exact.init(k, *a, iters=4))(
        jax.random.PRNGKey(0), *args
    )

    def bench(model, tag):
        @jax.jit
        def fwd(params, *a):
            out = model.apply(params, *a, iters=4)
            return out["traj"], out["vis"]

        traj, vis = fwd(params, *args)
        float(traj[0, 0, 0])  # sync

        def timed(reps):
            t0 = time.perf_counter()
            for _ in range(reps):
                tr, _ = fwd(params, *args)
            # Block on the final dispatch explicitly: in-order execution of
            # the queued calls is a TPU property, not a backend guarantee.
            jax.block_until_ready(tr)
            return (time.perf_counter() - t0) / reps

        timed(3)
        step = min(timed(10), timed(10))
        print(f"{tag}: {step * 1e3:.1f} ms/fwd  ->  {n * t / step:,.0f} pf/s")
        return np.asarray(traj), step

    traj_exact, step_exact = bench(model_exact, "exact  ")
    traj_reuse, step_reuse = bench(model_reuse, "reuse  ")

    d = np.linalg.norm(traj_exact - traj_reuse, axis=-1)
    scene_scale = float(np.asarray(args[2])[:, 1:].std())  # query xyz spread
    print(
        f"divergence |exact-reuse|: mean {d.mean():.4g}  p95 {np.percentile(d, 95):.4g}"
        f"  max {d.max():.4g}  (scene xyz std {scene_scale:.3g})"
    )
    print(f"speedup: {step_exact / step_reuse:.3f}x")


if __name__ == "__main__":
    main()
