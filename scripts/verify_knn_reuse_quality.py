"""Quality check for corr_knn_reuse on a model that actually tracks motion.

Trains the overfit smoke config (same recipe as overfit_verify.py), then
evaluates the SAME trained params through (a) the exact per-iteration kNN
path and (b) the corr_knn_reuse path, plus CopyCat for scale. If the two
metric rows match, the 1.39x-faster reuse path is quality-neutral and safe
to recommend for inference.

Run on the TPU chip: `python scripts/verify_knn_reuse_quality.py --steps 1200`
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1200)
    parser.add_argument("--exp_dir", default="/tmp/knn_reuse_quality")
    parser.add_argument("--scenes", type=int, default=2)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    import numpy as np

    from mvtracker_tpu.datasets.loader import PrefetchLoader, SyntheticSceneDataset
    from mvtracker_tpu.evaluation.evaluator import Evaluator
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker
    from mvtracker_tpu.training.train import TrainConfig, Trainer
    from mvtracker_tpu.models.copycat import CopyCatPredictor

    cfg_model = dict(
        sliding_window_len=8,
        fmaps_dim=64,
        num_heads=6,
        hidden_size=192,
        space_depth=3,
        time_depth=3,
        num_virtual_tracks=16,
        corr_n_levels=3,
        corr_neighbors=8,
    )
    model = MVTracker(**cfg_model)
    model_reuse = MVTracker(corr_knn_reuse=True, **cfg_model)

    ds = SyntheticSceneDataset(
        n_scenes=args.scenes, cache=True,
        n_views=2, n_frames=12, height=64, width=64, n_tracks=32,
    )
    loader = PrefetchLoader(ds, batch_size=1, num_workers=1, shuffle=True)

    cfg = TrainConfig(
        total_steps=args.steps,
        lr=3e-4,
        schedule="const",
        warmup_steps=0,
        adaptive_iters=False,
        train_iters=3,
        save_ckpt_freq=args.steps,
        eval_freq=10**9,
        telemetry_freq=200,
        exp_dir=args.exp_dir,
    )
    trainer = Trainer(model, cfg)
    state = trainer.fit(iter(loader), max_steps=args.steps)

    evaluator = Evaluator("kubric-multiview")
    scenes = [ds[i] for i in range(args.scenes)]

    results = {}
    trajs = {}
    for tag, mdl in (("exact", model), ("reuse", model_reuse)):
        predictor = EvaluationPredictor(
            mdl, state.params, interp_shape=None, grid_size=0, n_iters=3
        )
        res, per_seq = evaluator.evaluate_sequence(predictor, scenes)
        results[tag] = res.get("all_any", {})
        # Raw trajectories for a direct divergence readout.
        trajs[tag] = [
            np.asarray(predictor(
                np.asarray(s.video), np.asarray(s.videodepth),
                np.asarray(s.query_points_3d), np.asarray(s.intrs),
                np.asarray(s.extrs),
            )["traj"]) for s in scenes
        ]
    res_cc, _ = evaluator.evaluate_sequence(CopyCatPredictor(), scenes)
    results["copycat"] = res_cc.get("all_any", {})

    keys = ("ate_visible", "mte_visible", "average_pts_within_thresh",
            "average_jaccard", "survival", "occlusion_accuracy")
    header = f"{'metric':<28}" + "".join(f"{t:>10}" for t in ("exact", "reuse", "copycat"))
    rows = [header]
    for k in keys:
        rows.append(
            f"{k:<28}" + "".join(
                f"{results[t].get(k, float('nan')):>10.3f}"
                for t in ("exact", "reuse", "copycat")
            )
        )
    print("\n".join(rows))

    d = np.concatenate([
        np.linalg.norm(a - b, axis=-1).ravel()
        for a, b in zip(trajs["exact"], trajs["reuse"])
    ])
    print(
        f"trajectory divergence |exact-reuse|: mean {d.mean():.4g} "
        f"p95 {np.percentile(d, 95):.4g} max {d.max():.4g}"
    )
    out = {
        "steps": args.steps,
        "results": {t: {k: float(results[t].get(k, float("nan"))) for k in keys}
                    for t in results},
        "divergence": {"mean": float(d.mean()), "p95": float(np.percentile(d, 95)),
                       "max": float(d.max())},
    }
    with open(os.path.join(args.exp_dir, "knn_reuse_quality.json"), "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
