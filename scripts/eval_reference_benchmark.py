"""One-command reference-benchmark runner (round-3 verdict #7).

Points at a downloaded benchmark root + a checkpoint (the reference's
released `.pth` or this repo's `.msgpack`) and emits the
BASELINE.md-comparable metric table: dataset-name DSL -> Evaluator ->
CSV/JSON. The numbers line up with the reference's published table
(`/root/reference/explainers/README_MVTRacker.md:205-221`; produced there
by `evaluator_3dpt.py:212-640`).

    python scripts/eval_reference_benchmark.py \
        --dataset kubric-multiview-views0123 \
        --dataset_root /data/benchmarks \
        --checkpoint weights/mvtracker_200000_june2025.pth

Expected data layout under --dataset_root (the reference's own download
layout, `explainers/README_MVTRacker.md:154-158`):

    <root>/kubric-multiview/<split>/<scene>/  tracks_3d.npz,
        tracks_segmentation_ids.npz, cameras.npz, view_*/rgba_*.png +
        depth_*.tiff + metadata.json          (~31 GB)
    <root>/panoptic-multiview/<scene>/        tapvid3d_annotations.npz,
        ims/<cam>/*.jpg, depths (per loader docstring)  (~13 GB)
    <root>/dex-ycb-multiview/<scene>/         tracks_3d.npz, view_*/
        color/depth frames                    (~29 GB)

The checkpoint may be:
- the reference torch release (`.pth`, converted on the fly by
  `mvtracker_tpu.convert.load_reference_checkpoint`), with
  `--model_size reference` (the default: the reference's published
  architecture, `mvtracker/models/core/mvtracker/mvtracker.py:94-128`);
- a repo msgpack export (`scripts/export_params_msgpack.py`) with the
  matching `--model_size` / model flags.

Loads are STRICT: a checkpoint that does not match the constructed model
raises instead of silently evaluating partially-initialized params.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_eval_model(model_size: str, **knobs):
    from mvtracker_tpu.models.mvtracker import MVTracker

    if model_size == "reference":
        # The reference's published architecture: S=12, fmaps 128, 6+6
        # depth, 64 virtual tracks, 4 corr levels x k=16 (= this repo's
        # MVTracker defaults), bf16 compute like the reference's
        # bf16-mixed eval autocast.
        return MVTracker(compute_dtype="bfloat16", **knobs)
    from mvtracker_tpu.presets import build_model

    return build_model(model_size, **knobs)


def setting_for_dataset(name: str) -> str:
    for prefix in ("kubric-multiview", "dexycb-multiview", "panoptic-multiview"):
        if name.startswith(prefix):
            return prefix
    raise ValueError(f"no evaluation setting for dataset {name!r}")


def run(args) -> dict:
    import jax
    import numpy as np

    from mvtracker_tpu.datasets.datapoint import collate
    from mvtracker_tpu.datasets.real_world import dataset_from_name
    from mvtracker_tpu.evaluation.evaluator import Evaluator
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.copycat import CopyCatPredictor
    from mvtracker_tpu.training import step as step_lib
    from mvtracker_tpu.training.train import TrainConfig, Trainer

    dataset = dataset_from_name(args.dataset, args.dataset_root)
    setting = setting_for_dataset(args.dataset)
    evaluator = Evaluator(setting, compute_2d_metrics=args.metrics_2d)

    model = build_eval_model(
        args.model_size,
        vis_geom_features=args.vis_geom,
        vis_head_hidden=args.vis_head_hidden,
        corr_knn_reuse=args.knn_reuse,
    )

    # Init params on the first datapoint's shapes, then strict-load weights.
    dp0 = dataset[0]
    batch = collate([dp0])
    example = {
        k: batch[k][0]
        for k in ("rgbs", "depths", "query_points", "intrs", "extrs")
    }
    trainer = Trainer(
        model,
        TrainConfig(exp_dir=args.scratch_dir, tensorboard=False, watchdog_timeout_s=0),
    )
    state = step_lib.init_state(
        model, trainer.optimizer, example, jax.random.PRNGKey(0), iters=1
    )
    state = trainer.warm_start(state, args.checkpoint, strict=True)

    interp = tuple(args.interp) if args.interp and args.interp[0] > 0 else None
    predictor = EvaluationPredictor(
        model,
        state.params,
        interp_shape=interp,
        grid_size=args.grid,
        n_iters=args.iters,
        visibility_threshold=args.visibility_threshold,
    )

    summary, per_seq = evaluator.evaluate_sequence(
        predictor, dataset, max_sequences=args.max_sequences or None
    )
    result = {
        "dataset": args.dataset,
        "setting": setting,
        "checkpoint": args.checkpoint,
        "interp": interp,
        "iters": args.iters,
        "grid": args.grid,
        "summary": summary,
    }
    if args.with_copycat:
        cc_summary, _ = evaluator.evaluate_sequence(
            CopyCatPredictor(), dataset, max_sequences=args.max_sequences or None
        )
        result["copycat"] = cc_summary

    if args.out_json:
        evaluator.save_json(result, args.out_json)
    if args.out_csv:
        evaluator.save_csv(per_seq, args.out_csv)
    return result


def format_table(result: dict) -> str:
    """BASELINE.md-comparable table (the reference README's metric rows)."""
    rows = []
    groups = result["summary"]
    keys = [
        ("ate_visible", "ATE-visible"),
        ("mte_visible", "MTE-visible"),
        ("average_jaccard", "Average Jaccard"),
        ("average_pts_within_thresh", "avg pts-within-thresh"),
        ("occlusion_accuracy", "Occlusion accuracy"),
        ("survival", "Survival"),
    ]
    header = f"{'metric':<24}" + "".join(
        f"{g:>16}" for g in groups if g.startswith("all_") or g == "dynamic_static_mean"
    )
    rows.append(header)
    for k, label in keys:
        cells = []
        for g, vals in groups.items():
            if not (g.startswith("all_") or g == "dynamic_static_mean"):
                continue
            v = vals.get(k) if isinstance(vals, dict) else None
            cells.append(f"{v:16.2f}" if isinstance(v, float) else f"{'-':>16}")
        rows.append(f"{label:<24}" + "".join(cells))
    return "\n".join(rows)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", required=True,
                   help="dataset-name DSL, e.g. kubric-multiview-views0123, "
                   "panoptic-multiview-views27_16_14_8, dexycb-multiview")
    p.add_argument("--dataset_root", required=True,
                   help="parent dir holding kubric-multiview/ panoptic-multiview/ "
                   "dex-ycb-multiview/ (see module docstring for layout)")
    p.add_argument("--checkpoint", required=True,
                   help=".pth (reference torch release, converted on the fly) "
                   "or .msgpack (repo export)")
    p.add_argument("--model_size", default="reference",
                   choices=["reference", "flagship", "medium", "small"])
    p.add_argument("--interp", type=int, nargs=2, default=[384, 512],
                   help="eval-time resize H W (reference always evaluates "
                   "through 384x512, evaluation_predictor_3dpt.py:71-87); "
                   "'0 0' = native resolution")
    p.add_argument("--iters", type=int, default=6,
                   help="refinement iterations (reference eval default)")
    p.add_argument("--grid", type=int, default=5,
                   help="support-grid size per view (0 disables)")
    p.add_argument("--visibility_threshold", type=float, default=0.5)
    p.add_argument("--vis_geom", action="store_true")
    p.add_argument("--vis_head_hidden", type=int, default=0)
    p.add_argument("--knn_reuse", action="store_true",
                   help="serving mode (corr_knn_reuse)")
    p.add_argument("--metrics_2d", action="store_true",
                   help="also compute per-view 2D TAP-Vid metrics")
    p.add_argument("--max_sequences", type=int, default=0, help="0 = all")
    p.add_argument("--with_copycat", action="store_true",
                   help="also run the no-motion baseline for context")
    p.add_argument("--scratch_dir", default="/tmp/eval_reference_benchmark")
    p.add_argument("--out_json", default=None)
    p.add_argument("--out_csv", default=None)
    args = p.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    result = run(args)
    print(format_table(result))
    print(json.dumps({k: v for k, v in result.items() if k != "summary"}, indent=2))


if __name__ == "__main__":
    main()
