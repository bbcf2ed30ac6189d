"""Train the compact learned 2D tracker (models/cotracker2d.py) on
monocular proxies of synthetic scenes, then evaluate it through
MonocularToMultiViewAdapter on held-out multi-view scenes against the NCC
template tracker and CopyCat.

    python scripts/train_cotracker2d.py --steps 4000
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=4000)
    parser.add_argument("--train_scenes", type=int, default=64)
    parser.add_argument("--eval_scenes", type=int, default=4)
    parser.add_argument("--exp_dir", default="/tmp/train_cotracker2d")
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--res", type=int, default=64)
    parser.add_argument("--texture_detail", type=float, default=1.0)
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--out_json", default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from mvtracker_tpu.datasets.loader import (
        MonocularProxyDataset,
        PrefetchLoader,
        SyntheticSceneDataset,
    )
    from mvtracker_tpu.evaluation.evaluator import Evaluator
    from mvtracker_tpu.models.cotracker2d import CoTracker2D, LearnedTracker2D
    from mvtracker_tpu.models.monocular import (
        MonocularToMultiViewAdapter,
        SimpleNNTracker2D,
    )
    from mvtracker_tpu.training.train import TrainConfig, Trainer
    from mvtracker_tpu.models.copycat import CopyCatPredictor

    model = CoTracker2D(
        sliding_window_len=8,
        stride=4,
        fmaps_dim=64,
        num_heads=6,
        hidden_size=192,
        space_depth=3,
        time_depth=3,
        num_virtual_tracks=16,
        corr_n_levels=3,
        corr_patch_radius=3,
    )
    kw = dict(
        n_views=2, n_frames=12, height=args.res, width=args.res,
        n_tracks=32, texture_detail=args.texture_detail,
    )
    train_ds = MonocularProxyDataset(
        SyntheticSceneDataset(
            n_scenes=args.train_scenes, cache=args.train_scenes <= 1024,
            seed=0, randomize=True, **kw
        )
    )
    eval_ds = SyntheticSceneDataset(
        n_scenes=args.eval_scenes, cache=True, seed=777, randomize=True, **kw
    )
    loader = PrefetchLoader(
        train_ds, batch_size=1, num_workers=args.workers, shuffle=True
    )
    cfg = TrainConfig(
        total_steps=args.steps,
        lr=args.lr,
        schedule="cos",
        warmup_steps=100,
        adaptive_iters=True,
        train_iters=3,
        save_ckpt_freq=max(args.steps // 2, 500),
        eval_freq=10**9,
        telemetry_freq=200,
        exp_dir=args.exp_dir,
    )
    trainer = Trainer(model, cfg)
    state = trainer.fit(loader.prefetching_iter(), max_steps=args.steps)

    evaluator = Evaluator("kubric-multiview")
    scenes = [eval_ds[i] for i in range(args.eval_scenes)]

    learned = MonocularToMultiViewAdapter(
        LearnedTracker2D(model, state.params, n_iters=3)
    )
    ncc = MonocularToMultiViewAdapter(SimpleNNTracker2D())

    res_learned, _ = evaluator.evaluate_sequence(learned, scenes)
    res_ncc, _ = evaluator.evaluate_sequence(ncc, scenes)
    res_copycat, _ = evaluator.evaluate_sequence(CopyCatPredictor(), scenes)

    report = {
        "steps": args.steps,
        "learned_cotracker2d": res_learned.get("all_any", {}),
        "ncc_template": res_ncc.get("all_any", {}),
        "copycat": res_copycat.get("all_any", {}),
    }
    print(json.dumps({k: report[k] if k == "steps" else {
        m: round(v, 2) for m, v in report[k].items() if isinstance(v, float)
    } for k in report}, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2, default=float)


if __name__ == "__main__":
    main()
