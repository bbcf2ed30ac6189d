"""Sequence evaluator (L6).

Re-design of the reference `Evaluator.evaluate_sequence`
(`mvtracker/evaluation/evaluator_3dpt.py:176-919`): loops a dataset of
Datapoints through an EvaluationPredictor, times per-datapoint FPS, computes
3D metrics with per-benchmark distance thresholds, and aggregates CSV/JSON
results. Host-side numpy orchestration around jitted device inference.
"""

from __future__ import annotations

import json
import logging
import time
from typing import Iterable, Optional

import numpy as np

from mvtracker_tpu.datasets.datapoint import Datapoint
from mvtracker_tpu.evaluation import metrics as metrics_lib

# Distance thresholds per evaluation setting; mirrors reference
# `evaluator_3dpt.py:87-123`.
EVALUATION_SETTINGS = {
    "kubric-multiview": dict(
        distance_thresholds=[0.05, 0.1, 0.2, 0.4, 0.8],
        survival_distance_threshold=0.5,
        static_threshold=0.01,
        dynamic_threshold=0.1,
        very_dynamic_threshold=2.0,
    ),
    "dexycb-multiview": dict(
        distance_thresholds=[0.01, 0.02, 0.05, 0.1, 0.2],
        survival_distance_threshold=0.5,
        static_threshold=0.01,
        dynamic_threshold=0.1,
        very_dynamic_threshold=2.0,
    ),
    "panoptic-multiview": dict(
        distance_thresholds=[0.05, 0.1, 0.2, 0.4],
        survival_distance_threshold=0.5,
        static_threshold=0.01,
        dynamic_threshold=0.1,
        very_dynamic_threshold=2.0,
    ),
}


class Evaluator:
    """Evaluate a predictor over an iterable of Datapoints."""

    def __init__(self, evaluation_setting: str = "kubric-multiview"):
        self.setting = evaluation_setting
        self.thresholds = EVALUATION_SETTINGS[evaluation_setting]

    def evaluate_sequence(
        self,
        predictor,
        dataset: Iterable[Datapoint],
        max_sequences: Optional[int] = None,
    ):
        """Returns (summary dict, per-sequence list)."""
        import jax.numpy as jnp

        per_seq = []
        for i, datapoint in enumerate(dataset):
            if max_sequences is not None and i >= max_sequences:
                break
            if hasattr(predictor, "set_sequence"):
                # Cached-prediction baselines (reference `evaluator_3dpt.py:497-514`).
                predictor.set_sequence(datapoint.seq_name)
            t0 = time.perf_counter()
            out = predictor(
                jnp.asarray(datapoint.video),
                jnp.asarray(datapoint.videodepth),
                jnp.asarray(datapoint.query_points_3d),
                jnp.asarray(datapoint.intrs),
                jnp.asarray(datapoint.extrs),
            )
            traj = np.asarray(out["traj"])
            occluded = np.asarray(out["occluded"])
            elapsed = time.perf_counter() - t0
            n_frames = datapoint.video.shape[1]
            fps = n_frames / elapsed

            vis_any = datapoint.visibility.any(axis=0)  # [T, N]
            results, _ = metrics_lib.evaluate_predictions(
                datapoint.trajectory_3d.astype(np.float32),
                vis_any,
                traj.astype(np.float32),
                occluded,
                query_points=datapoint.query_points_3d.astype(np.float32),
                **self.thresholds,
            )
            results["fps"] = fps
            results["seq_name"] = datapoint.seq_name
            per_seq.append(results)
            logging.info(
                "eval %s: fps=%.2f ate=%.2f aj=%.2f",
                datapoint.seq_name,
                fps,
                results.get("all_any", {}).get("ate_visible", float("nan")),
                results.get("all_any", {}).get("average_jaccard", float("nan")),
            )

        summary = self.summarize(per_seq)
        return summary, per_seq

    @staticmethod
    def summarize(per_seq: list[dict]) -> dict:
        """Average metric groups across sequences (reference writes
        per-sequence + averaged CSVs, `cli/train.py:293-304`)."""
        summary: dict = {"n_sequences": len(per_seq)}
        if not per_seq:
            return summary
        groups = [k for k in per_seq[0] if isinstance(per_seq[0][k], dict)]
        for g in groups:
            vals: dict[str, list] = {}
            for r in per_seq:
                if g not in r:
                    continue
                for k, v in r[g].items():
                    vals.setdefault(k, []).append(v)
            summary[g] = {k: float(np.mean(v)) for k, v in vals.items()}
        summary["fps"] = float(np.mean([r["fps"] for r in per_seq]))
        return summary

    @staticmethod
    def save_json(summary: dict, path: str):
        with open(path, "w") as f:
            json.dump(summary, f, indent=2, default=float)

    @staticmethod
    def save_csv(per_seq: list[dict], path: str):
        """Flat per-sequence CSV (group/metric columns)."""
        import csv

        rows = []
        for r in per_seq:
            row = {"seq_name": r["seq_name"], "fps": r["fps"]}
            for g, metrics in r.items():
                if isinstance(metrics, dict):
                    for k, v in metrics.items():
                        row[f"{g}/{k}"] = v
            rows.append(row)
        keys = sorted({k for row in rows for k in row}, key=str)
        with open(path, "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=keys)
            writer.writeheader()
            writer.writerows(rows)
