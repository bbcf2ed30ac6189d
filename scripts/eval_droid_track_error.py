"""BASELINE north-star: median 3D track error (meters) on DROID eval episodes.

One command, end to end: synthesizes DROID-format episodes (FK gripper-track
GT from the REAL `droid/pipeline.process_episode`, ray-traced recordings in
the exact episode layout — see `droid/synth_episode.py`), runs the released
checkpoint through the full episode path (`datasets/droid.load_droid_episode`
-> FFV1 depth decode -> EvaluationPredictor), and reports:

  - median_3d_track_error_m: median over all tracks (pooled across
    episodes) of the per-track median 3D error over visible frames —
    the reference's `mte_visible_per_track` statistic
    (`mvtracker/evaluation/metrics.py:33`), in meters.
  - the full metric-threshold evaluator summary (DROID thresholds
    0.01-0.2 m, dexycb-style since both are metric tabletop settings)
  - per-episode FPS (steady-state, first-compile excluded)
  - the same numbers for CopyCat (no-motion) as the baseline floor.

    python scripts/eval_droid_track_error.py \
        --params_msgpack release/mvtracker_medium_synth.msgpack \
        --model_size medium --vis_geom --vis_head_hidden 128 --fp32 \
        --out_json RESULTS_droid_synth.json

Runs on CPU (`--cpu`) or TPU; episodes are cached under --root.
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/droid_synth_eval")
    p.add_argument("--episodes", type=int, default=4)
    p.add_argument("--frames", type=int, default=48)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=192)
    p.add_argument("--external_cams", type=int, default=2)
    p.add_argument("--no_wrist", action="store_true",
                   help="external cameras only (the wrist view is the "
                   "hardest: it rides the EE, so the gripper is near-static "
                   "in-frame while the world moves)")
    p.add_argument("--track_points", type=int, default=24)
    p.add_argument("--cams", nargs="*", default=None,
                   help="restrict eval to these camera ids (e.g. 100 101 "
                   "to exclude the moving wrist view from already-rendered "
                   "episodes)")
    p.add_argument("--params_msgpack",
                   default="release/mvtracker_medium_synth.msgpack")
    p.add_argument("--model_size",
                   choices=["small", "medium", "flagship"], default="medium")
    p.add_argument("--vis_geom", action="store_true", default=True)
    p.add_argument("--no_vis_geom", dest="vis_geom", action="store_false")
    p.add_argument("--vis_head_hidden", type=int, default=128)
    p.add_argument("--fp32", action="store_true", default=True)
    p.add_argument("--bf16", dest="fp32", action="store_false")
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--grid", type=int, default=0)
    p.add_argument("--interp", type=int, nargs=2, default=None,
                   help="eval-time resize HxW (default: native)")
    p.add_argument("--knn_reuse", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--world_scale", default="auto",
                   help="similarity-transform the metric episode into the "
                   "checkpoint's trained world scale before inference and "
                   "invert on the way out ('auto' = target median depth 4.0 "
                   "[the synthetic training domain's camera distance] / "
                   "episode median depth; a number = fixed scale; 1 = off). "
                   "This is scene normalization done right for metric "
                   "scenes — the reference's in-forward variant clamps all "
                   "depth below 24 UP to 24 (`mvtracker.py:466-467`) and "
                   "is useless at tabletop scale.")
    p.add_argument("--out_json", default="RESULTS_droid_synth.json")
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )

    from mvtracker_tpu.datasets.droid import DroidEpisodeDataset
    from mvtracker_tpu.droid.synth_episode import build_episode
    from mvtracker_tpu.evaluation import metrics as metrics_lib
    from mvtracker_tpu.evaluation.evaluator import Evaluator
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.copycat import CopyCatPredictor
    from mvtracker_tpu.presets import build_model
    from mvtracker_tpu.training import step as step_lib
    from mvtracker_tpu.training.train import TrainConfig, Trainer

    # 1. Episodes (cached; ~8 s/episode to build on first run).
    for seed in range(args.episodes):
        out = build_episode(
            args.root, seed=seed, n_frames=args.frames,
            n_external_cams=args.external_cams,
            width=args.width, height=args.height,
            num_track_points=args.track_points,
            include_wrist=not args.no_wrist,
        )
        logging.info("episode ready: %s", out)
    ds = DroidEpisodeDataset(os.path.join(args.root, "processed"),
                             cams=args.cams or None)
    scenes = [ds[i] for i in range(len(ds))]

    # 2. Released-checkpoint predictor (strict msgpack load — mismatched
    #    model flags raise rather than score half-random params).
    over = {"compute_dtype": "float32"} if args.fp32 else {}
    model = build_model(args.model_size, vis_geom=args.vis_geom,
                        vis_head_hidden=args.vis_head_hidden,
                        knn_reuse=args.knn_reuse, **over)
    trainer = Trainer(model, TrainConfig(exp_dir=os.path.join(args.root, "exp"),
                                         tensorboard=False, watchdog_timeout_s=0))
    from mvtracker_tpu.datasets.datapoint import collate

    batch = collate([scenes[0]])
    example = {k: v[0] for k, v in batch.items()
               if hasattr(v, "ndim") and v.ndim > 0}
    state = step_lib.init_state(model, trainer.optimizer, example,
                                jax.random.PRNGKey(0), iters=1)
    state = trainer.warm_start(state, args.params_msgpack, strict=True)
    base_pred = EvaluationPredictor(
        model, state.params,
        interp_shape=tuple(args.interp) if args.interp else None,
        grid_size=args.grid, n_iters=args.iters,
    )

    class ScaledPredictor:
        """Runs the model in its trained world scale: depths, camera
        translations, and query xyz are multiplied by S on the way in;
        predicted trajectories divided by S on the way out. A pure
        similarity transform — pixels, intrinsics, and rotations are
        untouched, so the image content is bit-identical."""

        def __init__(self, inner, scale):
            self.inner, self.s = inner, float(scale)

        def __call__(self, video, videodepth, queries, intrs, extrs):
            s = self.s
            ex = extrs.copy()
            ex[..., :3, 3] *= s
            q = queries.copy()
            q[..., 1:4] *= s
            out = dict(self.inner(video, videodepth * s, q, intrs, ex))
            out["traj"] = np.asarray(out["traj"]) / s
            return out

    scale = 1.0
    if args.world_scale == "auto":
        med = float(np.median(np.concatenate(
            [dp.videodepth[dp.videodepth > 0].ravel() for dp in scenes]
        )))
        scale = 4.0 / med
    else:
        scale = float(args.world_scale)
    logging.info("world scale for inference: %.3f", scale)
    ours = ScaledPredictor(base_pred, scale) if scale != 1.0 else base_pred

    evaluator = Evaluator("droid")

    def run(predictor, name):
        summary, per_seq = evaluator.evaluate_sequence(predictor, scenes)
        # Pooled per-track median 3D error -> ONE number, in meters.
        per_track_mte = []
        for dp in scenes:
            pred = predictor(
                np.asarray(dp.video, np.float32),
                np.asarray(dp.videodepth, np.float32),
                np.asarray(dp.query_points_3d, np.float32),
                np.asarray(dp.intrs, np.float32),
                np.asarray(dp.extrs, np.float32),
            )
            m = metrics_lib.compute_metrics(
                np.asarray(dp.query_points_3d, np.float32)[None],
                ~dp.visibility.any(axis=0)[None],
                dp.trajectory_3d[None].astype(np.float32),
                np.asarray(pred["occluded"])[None],
                np.asarray(pred["traj"], np.float32)[None],
                distance_thresholds=evaluator.thresholds["distance_thresholds"],
                survival_distance_threshold=(
                    evaluator.thresholds["survival_distance_threshold"]),
            )
            per_track_mte.append(np.asarray(m["mte_visible_per_track"])[0])
        pooled = np.concatenate(per_track_mte)
        out = {
            "median_3d_track_error_m": float(np.median(pooled)),
            "mean_3d_track_error_m": float(pooled.mean()),
            "p90_3d_track_error_m": float(np.percentile(pooled, 90)),
            "fps": summary["fps"],
            "summary_all_any": {
                k: round(v, 3) for k, v in summary.get("all_any", {}).items()
                if isinstance(v, float)
            },
        }
        logging.info(
            "%s: median 3D track error %.4f m (mean %.4f, p90 %.4f), fps %.2f",
            name, out["median_3d_track_error_m"], out["mean_3d_track_error_m"],
            out["p90_3d_track_error_m"], out["fps"],
        )
        return out

    results = {
        "protocol": {
            "episodes": args.episodes, "frames": args.frames,
            "cams": args.external_cams + (0 if args.no_wrist else 1),
            "resolution": [args.height, args.width],
            "track_points_per_finger": args.track_points,
            "queries": "gripper (FK contact points, frame 0)",
            "checkpoint": args.params_msgpack,
            "iters": args.iters, "grid": args.grid,
            "interp": args.interp, "backend": jax.devices()[0].platform,
            "world_scale": scale,
        },
        "copycat": run(CopyCatPredictor(), "copycat"),
        "ours": run(ours, "ours"),
    }
    with open(args.out_json, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(json.dumps({
        "median_3d_track_error_m": results["ours"]["median_3d_track_error_m"],
        "copycat_median_m": results["copycat"]["median_3d_track_error_m"],
        "fps": results["ours"]["fps"],
    }))


if __name__ == "__main__":
    main()
