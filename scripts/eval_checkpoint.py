"""Evaluate a trained checkpoint on held-out synthetic scenes vs CopyCat.

Loads the latest orbax checkpoint from an experiment dir (the
train_synthetic.py layout) and sweeps eval-time settings the training
script doesn't expose (refinement iterations, per-view support grids),
mirroring the reference's eval-time knobs (`evaluation_predictor_3dpt.py`).

    python scripts/eval_checkpoint.py --exp_dir experiments/r2_medium_tex \
        --model_size medium --views 4 --res 96 --iters 3 6 --grid 0 5
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--exp_dir", required=True)
    parser.add_argument("--model_size", choices=["small", "medium"], default="medium")
    parser.add_argument("--eval_scenes", type=int, default=8)
    parser.add_argument("--views", type=int, default=4)
    parser.add_argument("--res", type=int, default=96)
    parser.add_argument("--texture_detail", type=float, default=1.0)
    parser.add_argument("--iters", type=int, nargs="+", default=[3, 6])
    parser.add_argument("--grid", type=int, nargs="+", default=[0])
    parser.add_argument("--out_json", default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from mvtracker_tpu.datasets.loader import SyntheticSceneDataset
    from mvtracker_tpu.evaluation.evaluator import Evaluator
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker
    from mvtracker_tpu.training import step as step_lib
    from mvtracker_tpu.training.train import TrainConfig, Trainer
    from mvtracker_tpu.models.copycat import CopyCatPredictor

    base = dict(sliding_window_len=8, corr_n_levels=3)
    sizes = {
        "small": dict(fmaps_dim=64, num_heads=6, hidden_size=192, space_depth=3,
                      time_depth=3, num_virtual_tracks=16, corr_neighbors=8),
        "medium": dict(fmaps_dim=96, num_heads=8, hidden_size=256, space_depth=4,
                       time_depth=4, num_virtual_tracks=32, corr_neighbors=12,
                       compute_dtype="bfloat16"),
    }
    model = MVTracker(**{**base, **sizes[args.model_size]})

    eval_ds = SyntheticSceneDataset(
        n_scenes=args.eval_scenes, cache=True, seed=777, randomize=True,
        n_views=args.views, n_frames=12, height=args.res, width=args.res,
        n_tracks=32, texture_detail=args.texture_detail,
    )
    scenes = [eval_ds[i] for i in range(args.eval_scenes)]

    # Restore params via the trainer's own checkpoint machinery.
    trainer = Trainer(model, TrainConfig(exp_dir=args.exp_dir, tensorboard=False,
                                         watchdog_timeout_s=0))
    from mvtracker_tpu.datasets.datapoint import collate

    batch = collate([scenes[0]])
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    state = step_lib.init_state(model, trainer.optimizer, example,
                                jax.random.PRNGKey(0), iters=1)
    state, step = trainer.restore_latest(state)
    assert step > 0, f"no checkpoint found in {args.exp_dir}"

    evaluator = Evaluator("kubric-multiview")
    copycat, _ = evaluator.evaluate_sequence(CopyCatPredictor(), scenes)
    rows = {"checkpoint_step": step,
            "copycat": {k: round(v, 3) for k, v in copycat["all_any"].items()
                        if isinstance(v, float)}}
    for it in args.iters:
        for g in args.grid:
            p = EvaluationPredictor(model, state.params, interp_shape=None,
                                    grid_size=g, n_iters=it)
            res, _ = evaluator.evaluate_sequence(p, scenes)
            key = f"iters{it}_grid{g}"
            rows[key] = {k: round(v, 3) for k, v in res["all_any"].items()
                         if isinstance(v, float)}
            logging.info(
                "%s: ATE %.2f AJ %.2f OA %.2f (CopyCat ATE %.2f AJ %.2f)",
                key, rows[key]["ate_visible"], rows[key]["average_jaccard"],
                rows[key]["occlusion_accuracy"],
                rows["copycat"]["ate_visible"], rows["copycat"]["average_jaccard"],
            )
    print(json.dumps(rows, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
