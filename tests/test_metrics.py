"""Metric parity tests: our numpy implementation vs the reference's torch
implementation (`/root/reference/mvtracker/evaluation/metrics.py`), executed
directly on random data. This pins our numerics to the reference bit-for-bit
(up to float tolerance) without copying its code.
"""

import sys

import numpy as np
import pytest

from mvtracker_tpu.evaluation import metrics as our_metrics

from tests.reference_compat import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo snapshot not present"
)


REF = "/root/reference"


def load_reference_metrics():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    try:
        from mvtracker.evaluation import metrics as ref_metrics  # noqa
        return ref_metrics
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference metrics unavailable: {e}")


def make_case(rng, b=1, t=12, n=24, d=3):
    gt_tracks = rng.normal(size=(b, t, n, d)).astype(np.float32)
    pred_tracks = (gt_tracks + rng.normal(size=(b, t, n, d)) * 0.1).astype(np.float32)
    gt_occ = rng.uniform(size=(b, t, n)) < 0.3
    pred_occ = rng.uniform(size=(b, t, n)) < 0.3
    qt = rng.integers(0, t // 2, size=(b, n))
    # Guarantee visibility at/after query for at least 2 frames.
    for bi in range(b):
        for p in range(n):
            gt_occ[bi, qt[bi, p], p] = False
            gt_occ[bi, min(qt[bi, p] + 1, t - 1), p] = False
    qcoords = np.take_along_axis(
        gt_tracks, qt[:, None, :, None].repeat(d, -1), axis=1
    )[:, 0]
    query = np.concatenate([qt[..., None], qcoords], axis=-1).astype(np.float32)
    return query, gt_occ, gt_tracks, pred_occ, pred_tracks


def test_compute_metrics_parity(rng):
    ref_metrics = load_reference_metrics()
    import torch

    case = make_case(rng)
    thresholds = [0.05, 0.1, 0.2, 0.4, 0.8]

    ours = our_metrics.compute_metrics(
        *case, distance_thresholds=thresholds, survival_distance_threshold=0.5
    )
    theirs = ref_metrics.compute_metrics(
        torch.from_numpy(case[0]),
        torch.from_numpy(case[1]),
        torch.from_numpy(case[2]),
        torch.from_numpy(case[3]),
        torch.from_numpy(case[4]),
        distance_thresholds=thresholds,
        survival_distance_threshold=0.5,
    )
    for k, v in theirs.items():
        assert k in ours, f"missing metric {k}"
        np.testing.assert_allclose(
            np.asarray(ours[k], dtype=np.float64),
            v.numpy().astype(np.float64),
            atol=1e-5,
            equal_nan=True,
            err_msg=k,
        )


def test_evaluate_predictions_parity(rng):
    ref_metrics = load_reference_metrics()

    case = make_case(rng, b=1, t=16, n=32)
    query, gt_occ, gt_tracks, pred_occ, pred_tracks = case
    # Make some tracks static so stratification kicks in.
    gt_tracks[:, :, :8] = gt_tracks[:, 0:1, :8]
    pred_tracks[:, :, :8] = gt_tracks[:, :, :8] + 0.001

    ours, _ = our_metrics.evaluate_predictions(
        gt_tracks[0],
        ~gt_occ[0],
        pred_tracks[0],
        pred_occ[0],
        query_points=query[0],
    )
    df, _ = ref_metrics.evaluate_predictions(
        gt_tracks[0],
        ~gt_occ[0],
        pred_tracks[0],
        pred_occ[0],
        query_points=query[0],
    )
    for col in df.columns:
        assert col in ours, f"missing group {col}"
        for row in df.index:
            ref_val = df.loc[row, col]
            if isinstance(ref_val, float) and np.isnan(ref_val):
                continue
            assert row in ours[col], f"missing metric {row} in {col}"
            np.testing.assert_allclose(
                ours[col][row], float(ref_val), atol=0.02, err_msg=f"{col}/{row}"
            )
