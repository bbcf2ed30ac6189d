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
    # DROID robot episodes are metric tabletop scenes like DexYCB; the
    # north-star metric (median 3D track error, BASELINE.md) is computed
    # alongside these thresholds by `scripts/eval_droid_track_error.py`.
    "droid": dict(
        distance_thresholds=[0.01, 0.02, 0.05, 0.1, 0.2],
        survival_distance_threshold=0.5,
        static_threshold=0.01,
        dynamic_threshold=0.1,
        very_dynamic_threshold=2.0,
    ),
}


class Evaluator:
    """Evaluate a predictor over an iterable of Datapoints."""

    def __init__(
        self,
        evaluation_setting: str = "kubric-multiview",
        compute_2d_metrics: bool = False,
        pixel_thresholds=(1, 2, 4, 8, 16),
        viz_dir: Optional[str] = None,
        viz_indices: Optional[list[int]] = None,
        query_mode: str = "first",
    ):
        self.setting = evaluation_setting
        self.thresholds = EVALUATION_SETTINGS[evaluation_setting]
        self.compute_2d_metrics = compute_2d_metrics
        self.pixel_thresholds = list(pixel_thresholds)
        # Visual validation outputs (the reference's primary test strategy,
        # SURVEY §4: mp4 overlays for configured indices,
        # `configs/train.yaml:52-55`).
        self.viz_dir = viz_dir
        self.viz_indices = viz_indices
        # TAP-Vid query protocol: "first" masks pre-query ground truth;
        # "strided" evaluates mid-video queries bidirectionally. Set from
        # the dataset's own protocol (e.g. TapVidDataset.query_mode).
        self.query_mode = query_mode
        # Input shapes whose compile cost has already been paid (fps warmup).
        self._timed_shapes: set = set()

    def _metrics_2d(self, datapoint, traj, occluded):
        """Per-view 2D TAP-Vid metrics: project world predictions into each
        view and compare in pixel space (reference `evaluator_3dpt.py:575-640`
        computes 3D and per-view 2D metrics side by side)."""
        import jax
        import jax.numpy as jnp

        from mvtracker_tpu.utils import geometry as geo

        v = datapoint.video.shape[0]
        n = traj.shape[1]
        out = {}
        # Host-side metric math stays on CPU even when the default device
        # is a (possibly tunneled) accelerator.
        cpu = jax.devices("cpu")[0]
        for vi in range(v):
            with jax.default_device(cpu):
                pix, z = geo.world_to_pixel_xy_and_camera_z(
                    jnp.asarray(traj),
                    jnp.asarray(datapoint.intrs[vi]),
                    jnp.asarray(datapoint.extrs[vi]),
                )
            # Runtime round-trip guard (reference `evaluator_3dpt.py:569`
            # WARNS when re-lifted projections deviate from world preds by
            # more than atol=1 — it does not abort). Match that: a diverged
            # model / early checkpoint can produce finite-but-huge coords
            # whose f32 round-trip error exceeds 1; the eval sweep should
            # still report its (terrible) metrics rather than die.
            with jax.default_device(cpu):
                back = geo.pixel_xy_and_camera_z_to_world(
                    pix,
                    z,
                    geo.invert_intrinsics(jnp.asarray(datapoint.intrs[vi])),
                    geo.invert_extrinsics(jnp.asarray(datapoint.extrs[vi])),
                )
            ok_z = np.abs(np.asarray(z))[..., 0] > 1e-3
            rdev = np.abs(np.asarray(back) - traj).max(axis=-1)
            rdev = float(rdev[ok_z].max(initial=0.0))
            if not rdev < 1.0:
                import warnings

                warnings.warn(
                    f"view {vi}: reprojection round-trip deviation {rdev:.3g} "
                    "exceeds atol=1 (intrinsics/extrinsics mis-application, "
                    "or a diverged prediction?)"
                )
            pred_2d = np.asarray(pix)
            gt_2d = datapoint.trajectory[vi, :, :, :2]
            vis_view = datapoint.visibility[vi]
            if not vis_view.any():
                continue
            qt = datapoint.query_points_3d[:, 0:1]
            first_vis = np.argmax(vis_view, axis=0)
            q2d = gt_2d[first_vis, np.arange(n)]
            query_2d = np.concatenate([qt, q2d], axis=1).astype(np.float32)
            # Mask visibility to at/after the query time like the 3D path
            # (`metrics.py::evaluate_predictions`); without it, a track
            # visible only at/before its query frame passes the >=2 filter
            # and trips compute_metrics' visible_count assert (evaluation
            # excludes the query frame and everything before it).
            t_frames = vis_view.shape[0]
            at_or_after = np.arange(t_frames)[:, None] >= qt[:, 0][None, :]
            vis_eval = vis_view & at_or_after
            ok = vis_eval.sum(axis=0) >= 2
            if ok.sum() == 0:
                continue
            m = metrics_lib.compute_metrics(
                query_2d[ok][None],
                ~vis_eval[:, ok][None],
                gt_2d[:, ok][None].astype(np.float32),
                occluded[:, ok][None],
                pred_2d[:, ok][None].astype(np.float32),
                distance_thresholds=self.pixel_thresholds,
                survival_distance_threshold=50,
            )
            out[f"view{vi}_2d"] = {
                k.replace("_per_track", ""): float(np.nanmean(val)) * 100
                for k, val in m.items()
            }
        return out

    def evaluate_sequence(
        self,
        predictor,
        dataset: Iterable[Datapoint],
        max_sequences: Optional[int] = None,
        shard: Optional[tuple[int, int]] = None,
    ):
        """Returns (summary dict, per-sequence list).

        `shard=(index, count)` evaluates every count-th sequence starting at
        index — multi-host evaluation sharding (the reference stubs this
        out, `cli/train.py:482-487`); merge shards' per_seq lists with
        `Evaluator.summarize`.
        """
        per_seq = []
        for i, datapoint in enumerate(dataset):
            if max_sequences is not None and i >= max_sequences:
                break
            if shard is not None and i % shard[1] != shard[0]:
                continue
            if hasattr(predictor, "set_sequence"):
                # Cached-prediction baselines (reference `evaluator_3dpt.py:497-514`).
                predictor.set_sequence(datapoint.seq_name)
            # Hand the predictor HOST arrays: a jitted predictor transfers
            # them once at call time; host-side predictors (adapters,
            # CopyCat) never touch the device. Eagerly device-putting here
            # instead runs the whole eval op-by-op over the accelerator
            # link — measured 17 s/scene over the tunneled TPU.
            args = (
                np.asarray(datapoint.video, np.float32),
                np.asarray(datapoint.videodepth, np.float32),
                np.asarray(datapoint.query_points_3d, np.float32),
                np.asarray(datapoint.intrs, np.float32),
                np.asarray(datapoint.extrs, np.float32),
            )
            shape_key = tuple(a.shape for a in args)
            if shape_key not in self._timed_shapes:
                # First datapoint of a shape pays XLA compilation (minutes
                # on TPU); run it untimed so the published fps measures
                # steady-state inference, not compile time. (The reference
                # on eager CUDA has no compile step to exclude.)
                self._timed_shapes.add(shape_key)
                np.asarray(predictor(*args)["traj"])
            t0 = time.perf_counter()
            out = predictor(*args)
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
                query_mode=self.query_mode,
                **self.thresholds,
            )
            if self.compute_2d_metrics and datapoint.trajectory is not None:
                results.update(self._metrics_2d(datapoint, traj, occluded))
            if self.viz_dir is not None and (
                self.viz_indices is None or i in self.viz_indices
            ):
                import os

                from mvtracker_tpu.viz.mp4 import render_multiview_mosaic, save_video

                os.makedirs(self.viz_dir, exist_ok=True)
                frames = render_multiview_mosaic(
                    datapoint.video.astype(np.uint8),
                    traj,
                    datapoint.intrs,
                    datapoint.extrs,
                    visibility=~occluded,
                )
                save_video(
                    frames, os.path.join(self.viz_dir, f"{datapoint.seq_name}.mp4")
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
        # Union over ALL sequences: a group can be absent from sequence 0
        # (e.g. no very-dynamic tracks there) yet present in the rest.
        groups: list[str] = []
        for r in per_seq:
            for k, v in r.items():
                if isinstance(v, dict) and k not in groups:
                    groups.append(k)
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
