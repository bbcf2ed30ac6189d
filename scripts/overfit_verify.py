"""Overfit-and-verify: train on a few cached synthetic scenes, then show the
learned tracker beats the no-motion CopyCat baseline on the same scenes.

This is the framework's convergence smoke test (the reference's overfit
experiments, `configs/experiment/mvtracker_overfit*.yaml`), wired all the
way through the evaluator so the full train->checkpoint->eval->metrics path
is exercised on real hardware.

    python scripts/overfit_verify.py --steps 400
"""

import argparse
import logging
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=400)
    parser.add_argument("--exp_dir", default="/tmp/overfit_verify")
    parser.add_argument("--scenes", type=int, default=2)
    parser.add_argument("--motion_speed", type=float, default=1.0)
    parser.add_argument("--texture_detail", type=float, default=0.0)
    parser.add_argument("--texture_noise", type=float, default=0.0)
    parser.add_argument("--global_match", action="store_true")
    parser.add_argument("--feat_id_weight", type=float, default=0.0)
    parser.add_argument("--iters_eval", type=int, default=3)
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

    model = MVTracker(
        sliding_window_len=8,
        fmaps_dim=64,
        num_heads=6,
        hidden_size=192,
        space_depth=3,
        time_depth=3,
        num_virtual_tracks=16,
        corr_n_levels=3,
        corr_neighbors=8,
        global_match_init=args.global_match,
    )
    ds = SyntheticSceneDataset(
        n_scenes=args.scenes, cache=True,
        n_views=2, n_frames=12, height=64, width=64, n_tracks=32,
        motion_speed=args.motion_speed, texture_detail=args.texture_detail,
        texture_noise=args.texture_noise,
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
        telemetry_freq=50,
        feat_id_loss_weight=args.feat_id_weight,
        exp_dir=args.exp_dir,
    )
    trainer = Trainer(model, cfg)
    state = trainer.fit(iter(loader), max_steps=args.steps)

    predictor = EvaluationPredictor(
        model, state.params, interp_shape=None, grid_size=0, n_iters=3
    )
    evaluator = Evaluator("kubric-multiview")
    scenes = [ds[i] for i in range(args.scenes)]

    ours, _ = evaluator.evaluate_sequence(predictor, scenes)
    copycat, _ = evaluator.evaluate_sequence(CopyCatPredictor(), scenes)

    rows = ["metric                     ours     copycat"]
    for key in ("ate_visible", "mte_visible", "average_pts_within_thresh", "average_jaccard", "survival"):
        a = ours.get("all_any", {}).get(key, float("nan"))
        b = copycat.get("all_any", {}).get(key, float("nan"))
        rows.append(f"{key:<26} {a:8.2f} {b:8.2f}")
    print("\n".join(rows))

    ours_ate = ours["all_any"]["ate_visible"]
    copy_ate = copycat["all_any"]["ate_visible"]
    print(
        f"\nRESULT: trained ATE {ours_ate:.2f} vs CopyCat {copy_ate:.2f} "
        f"({'BEATS' if ours_ate < copy_ate else 'DOES NOT BEAT'} baseline)"
    )


if __name__ == "__main__":
    main()
