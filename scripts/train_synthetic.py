"""Generalization training: train on N synthetic scenes, evaluate on
held-out scenes vs CopyCat. A stronger learning check than pure overfit.

    python scripts/train_synthetic.py --steps 8000
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=8000)
    parser.add_argument("--train_scenes", type=int, default=16)
    parser.add_argument("--eval_scenes", type=int, default=4)
    parser.add_argument("--exp_dir", default="/tmp/train_synth")
    parser.add_argument("--lr", type=float, default=5e-4)
    parser.add_argument("--out_json", default=None)
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--motion_speed", type=float, default=1.0)
    parser.add_argument("--static_fraction", type=float, default=-1.0,
                        help="fraction of static objects per scene (-1 = "
                        "randomized 0..0.5 per scene). 0 + high "
                        "--motion_speed = the identity-escape curriculum: "
                        "every track moves, so the no-motion attractor is "
                        "maximally penalized")
    parser.add_argument("--rotate", action="store_true")
    parser.add_argument("--valid_vis", action="store_true",
                        help="supervise only any-view-visible track entries")
    parser.add_argument("--views", type=int, default=2)
    parser.add_argument("--res", type=int, default=64)
    parser.add_argument("--focal", type=float, default=1.0)
    parser.add_argument("--texture_detail", type=float, default=0.0,
                        help="high-frequency texture bands (0=historical "
                        "smooth bands; ~1.0 makes surface points localizable)")
    parser.add_argument("--texture_noise", type=float, default=0.0,
                        help="hashed value-noise texture weight (non-periodic, "
                        "localizable in all surface directions; the r4 domain)")
    parser.add_argument("--workers", type=int, default=2)
    parser.add_argument("--eval_every", type=int, default=0,
                        help="periodic held-out eval vs CopyCat every N steps "
                        "(appended to <exp_dir>/eval_log.jsonl); 0 disables")
    parser.add_argument("--model_size", choices=["small", "medium", "flagship"],
                        default="small",
                        help="small: the historical smoke config; medium: "
                        "2x width/depth for longer fresh-scene runs; "
                        "flagship: reference-width (fmaps 128, depth 6+6, "
                        "64 virtual tracks, k=16, 4 corr levels)")
    parser.add_argument("--vis_geom", action="store_true",
                        help="feed per-view depth z-test features into the "
                        "visibility head (vis_geom_features)")
    parser.add_argument("--vis_head_hidden", type=int, default=0,
                        help="hidden width of the visibility head MLP "
                        "(0 = reference single Linear)")
    parser.add_argument("--corr_k0", type=int, default=0,
                        help="neighbor count at the FINEST correlation level "
                        "(0 = uniform preset k; widened fine-level coverage "
                        "for high-res motion, warm-start-migrated)")
    parser.add_argument("--global_match", action="store_true",
                        help="global soft-match window init (whole-scene "
                        "capture range; enable once features are trained)")
    parser.add_argument("--chain_velocity", type=float, default=0.0,
                        help="constant-velocity extrapolation factor for the "
                        "chained window init (0 = reference static copy)")
    parser.add_argument("--n_tracks", type=int, default=32)
    parser.add_argument("--frames", type=int, default=12)
    parser.add_argument("--watchdog_exit", action="store_true",
                        help="hard-kill the process after a watchdog hang dump "
                        "(for scripts/run_supervised_train.sh restart loops)")
    parser.add_argument("--watchdog_timeout", type=float, default=600.0)
    parser.add_argument("--warm_start", default="",
                        help="msgpack/pth weights to warm-start from "
                        "(non-strict merge; TrainConfig.warm_start_ckpt)")
    parser.add_argument("--no_adaptive", action="store_true",
                        help="fixed train_iters every step (single compiled "
                        "executable; the adaptive mix alternates programs, "
                        "which serializes dispatch pipelining over the "
                        "tunneled backend)")
    parser.add_argument("--sync_every", type=int, default=1,
                        help="device-sync (loss fetch) cadence; >1 pipelines "
                        "host->device transfers with compute (TrainConfig."
                        "sync_every)")
    parser.add_argument("--save_every", type=int, default=0,
                        help="checkpoint frequency override (0 = auto)")
    parser.add_argument("--fp32", action="store_true",
                        help="override the preset's compute dtype to float32 "
                        "(bf16 ablation)")
    parser.add_argument("--feat_id_weight", type=float, default=0.0,
                        help="aux contrastive point-identity loss on encoder "
                        "features (losses.feature_identity_loss); breaks the "
                        "corr-pathway chicken-and-egg for from-scratch "
                        "multi-scene training")
    parser.add_argument("--vis_loss_weight", type=float, default=0.1,
                        help="visibility BCE weight (reference "
                        "configs/train.yaml:44 uses 0.1)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    if args.watchdog_exit:
        # Arm BEFORE touching the device: the axon tunnel has wedged during
        # backend init / the pre-fit CopyCat eval (observed: futex-blocked
        # process with 9 s CPU after 10 min, no watchdog armed yet because
        # Trainer.fit hadn't started). fit() re-arms with its own deadline.
        from mvtracker_tpu.utils.observability import install_hang_watchdog

        install_hang_watchdog(args.watchdog_timeout, exit=True)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import numpy as np

    from mvtracker_tpu.datasets.loader import (
        PrefetchLoader,
        SyntheticSceneDataset,
        compress_batch_for_transfer,
    )
    from mvtracker_tpu.evaluation.evaluator import Evaluator
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.presets import build_model
    from mvtracker_tpu.training.train import TrainConfig, Trainer
    from mvtracker_tpu.models.copycat import CopyCatPredictor

    over = {"compute_dtype": "float32"} if args.fp32 else {}
    model = build_model(args.model_size, vis_geom=args.vis_geom,
                        vis_head_hidden=args.vis_head_hidden,
                        corr_k0=args.corr_k0,
                        global_match=args.global_match,
                        chain_velocity=args.chain_velocity, **over)
    kw = dict(
        n_views=args.views, n_frames=args.frames, height=args.res, width=args.res,
        n_tracks=args.n_tracks, motion_speed=args.motion_speed,
        rotate_objects=args.rotate,
        valid_from_visibility=args.valid_vis, focal_factor=args.focal,
        texture_detail=args.texture_detail,
        texture_noise=args.texture_noise,
    )
    if args.static_fraction >= 0.0:
        kw["static_fraction"] = args.static_fraction
    # Caching only pays when scenes repeat (small datasets get memorized AND
    # cached); a large n_scenes means every step sees a fresh scene and the
    # cache would only grow unbounded (~2 MB/scene).
    train_ds = SyntheticSceneDataset(
        n_scenes=args.train_scenes, cache=args.train_scenes <= 1024, seed=0,
        randomize=True, augment=args.augment,
        # Survives supervisor restarts (the in-memory cache does not).
        disk_cache_dir=os.path.join(args.exp_dir, "scene_cache"),
        **kw
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
        adaptive_iters=not args.no_adaptive,
        train_iters=3,
        save_ckpt_freq=args.save_every or max(min(args.steps // 2, 2500), 500),
        watchdog_timeout_s=args.watchdog_timeout,
        watchdog_exit=args.watchdog_exit,
        visibility_loss_weight=args.vis_loss_weight,
        feat_id_loss_weight=args.feat_id_weight,
        sync_every=args.sync_every,
        warm_start_ckpt=args.warm_start,
        eval_freq=args.eval_every if args.eval_every else 10**9,
        telemetry_freq=200,
        exp_dir=args.exp_dir,
    )
    trainer = Trainer(model, cfg)

    scenes = [eval_ds[i] for i in range(args.eval_scenes)]
    evaluator = Evaluator("kubric-multiview")
    copycat_res, _ = evaluator.evaluate_sequence(CopyCatPredictor(), scenes)
    copycat_summary = {
        m: round(v, 3)
        for m, v in copycat_res.get("all_any", {}).items()
        if isinstance(v, float)
    }
    logging.info("CopyCat held-out baseline: %s", copycat_summary)

    def eval_fn(state, step):
        """Periodic held-out eval vs CopyCat; appended to eval_log.jsonl."""
        p = EvaluationPredictor(
            model, state.params, interp_shape=None, grid_size=0, n_iters=3
        )
        res, _ = evaluator.evaluate_sequence(p, scenes)
        entry = {
            "step": step,
            "ours": {
                m: round(v, 3)
                for m, v in res.get("all_any", {}).items()
                if isinstance(v, float)
            },
            "copycat": copycat_summary,
        }
        logging.info(
            "heldout@%d: ATE %.2f AJ %.2f (CopyCat ATE %.2f AJ %.2f)",
            step,
            entry["ours"].get("ate_visible", float("nan")),
            entry["ours"].get("average_jaccard", float("nan")),
            copycat_summary.get("ate_visible", float("nan")),
            copycat_summary.get("average_jaccard", float("nan")),
        )
        with open(os.path.join(args.exp_dir, "eval_log.jsonl"), "a") as f:
            f.write(json.dumps(entry, default=float) + "\n")
        return entry["ours"]

    os.makedirs(args.exp_dir, exist_ok=True)
    data_iter = (
        compress_batch_for_transfer(b) for b in loader.prefetching_iter()
    )
    state = trainer.fit(data_iter, max_steps=args.steps, eval_fn=eval_fn)

    predictor = EvaluationPredictor(model, state.params, interp_shape=None, grid_size=0, n_iters=3)
    ours, _ = evaluator.evaluate_sequence(predictor, scenes)

    report = {
        "steps": args.steps,
        "ours": ours.get("all_any", {}),
        "copycat": copycat_res.get("all_any", {}),
    }
    print(json.dumps({k: report[k] if k == "steps" else {
        m: round(v, 2) for m, v in report[k].items() if isinstance(v, float)
    } for k in report}, indent=2))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(report, f, indent=2, default=float)


if __name__ == "__main__":
    main()
