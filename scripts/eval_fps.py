"""Evaluation-path FPS on chip: full EvaluationPredictor with support grids.

The reference logs per-datapoint FPS during evaluation
(`evaluator_3dpt.py:496-524`) but publishes no number; this script produces
ours under realistic eval settings (resize to 384x512, 5x5 support grid per
view, 6 refinement iterations) on procedurally generated scenes.

Run on the TPU chip: `python scripts/eval_fps.py`
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

    from mvtracker_tpu.datasets.synthetic import render_scene
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker

    v, t, n = 4, 24, 128
    dp = render_scene(n_views=v, n_frames=t, height=256, width=256, n_tracks=n, seed=0)
    rgbs = jax.device_put(np.asarray(dp.video))
    depths = jax.device_put(np.asarray(dp.videodepth))
    queries = jax.device_put(np.asarray(dp.query_points_3d))
    intrs = jax.device_put(np.asarray(dp.intrs))
    extrs = jax.device_put(np.asarray(dp.extrs))

    model = MVTracker(compute_dtype="bfloat16")
    params = jax.jit(
        lambda k: model.init(k, rgbs, depths, queries, intrs, extrs, iters=2)
    )(jax.random.PRNGKey(0))

    pred = EvaluationPredictor(
        model,
        params,
        interp_shape=(384, 512),
        grid_size=5,
        n_grids_per_view=1,
        n_iters=6,
    )

    # Warmup/compile, then timed passes.
    out = pred(rgbs, depths, queries, intrs, extrs)
    float(out["traj"][0, 0, 0])
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pred(rgbs, depths, queries, intrs, extrs)
    float(out["traj"][0, 0, 0])
    dt = (time.perf_counter() - t0) / reps
    fps = t / dt
    n_support = v * 25
    print(
        f"eval predictor: {dt*1e3:.1f} ms/datapoint -> {fps:.2f} frames/s "
        f"({v} views x {t} frames @384x512, {n} queries + {n_support} support, 6 iters)"
    )


if __name__ == "__main__":
    main()
