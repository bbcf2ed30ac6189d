"""Independent-oracle redundancy for the TAP-Vid metrics.

`compute_tapvid_metrics` (this framework's per-track implementation, parity-
tested against the reference's main impl in test_metrics.py) is property-
tested here against `compute_tapvid_metrics_original`, the DeepMind
reference implementation the reference repo keeps as a cross-check
(`/root/reference/mvtracker/evaluation/metrics.py:174-300`).

The original pools metrics over points per video; ours is per-track. They
coincide exactly on single-track videos (any inputs), and for
points-within-threshold whenever all tracks share the same visible count.
"""

import numpy as np
import pytest

from mvtracker_tpu.evaluation.metrics import (
    compute_tapvid_metrics,
    compute_tapvid_metrics_original,
)


def random_case(rng, b, n, t, query_mode, occlude=True):
    """Build one randomized case in BOTH conventions.

    Returns (ours_kwargs, orig_kwargs).
    """
    gt_tracks = rng.uniform(0, 256, size=(b, n, t, 2))
    pred_tracks = gt_tracks + rng.normal(0, 5, size=(b, n, t, 2))
    gt_occ = rng.random((b, n, t)) < (0.3 if occlude else 0.0)
    pred_occ = rng.random((b, n, t)) < 0.3
    if query_mode == "first":
        qt = rng.integers(0, t - 2, size=(b, n))
    else:
        qt = rng.integers(0, t, size=(b, n))
    # Every track needs >= 1 visible eval frame for both impls to be finite:
    # force visibility on the last frame (always an eval frame).
    gt_occ[..., -1] = False

    q_orig = np.stack(
        [qt, rng.uniform(0, 256, (b, n)), rng.uniform(0, 256, (b, n))], axis=-1
    )
    orig = dict(
        query_points=q_orig,
        gt_occluded=gt_occ,
        gt_tracks=gt_tracks,
        pred_occluded=pred_occ,
        pred_tracks=pred_tracks,
        query_mode=query_mode,
    )
    ours = dict(
        query_points=q_orig[..., [0, 2, 1]],  # (t, x, y) — only t is used
        gt_occluded=gt_occ.transpose(0, 2, 1),
        gt_tracks=gt_tracks.transpose(0, 2, 1, 3),
        pred_occluded=pred_occ.transpose(0, 2, 1),
        pred_tracks=pred_tracks.transpose(0, 2, 1, 3),
        distance_thresholds=[1, 2, 4, 8, 16],
        query_mode=query_mode,
    )
    return ours, orig


@pytest.mark.parametrize("query_mode", ["first", "strided"])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_single_track_equivalence(query_mode, seed):
    """With one track per video, per-track == pooled: every metric must
    match the DeepMind oracle exactly."""
    rng = np.random.default_rng(seed)
    ours_kw, orig_kw = random_case(rng, b=6, n=1, t=12, query_mode=query_mode)
    ours = compute_tapvid_metrics(**ours_kw)
    orig = compute_tapvid_metrics_original(**orig_kw)

    for thresh in [1, 2, 4, 8, 16]:
        np.testing.assert_allclose(
            ours[f"pts_within_{thresh:.2f}_per_track"][:, 0],
            orig[f"pts_within_{thresh}"],
            atol=1e-12,
            err_msg=f"pts_within_{thresh}",
        )
        np.testing.assert_allclose(
            ours[f"jaccard_{thresh:.2f}_per_track"][:, 0],
            orig[f"jaccard_{thresh}"],
            atol=1e-12,
            err_msg=f"jaccard_{thresh}",
        )
    np.testing.assert_allclose(
        ours["average_jaccard_per_track"][:, 0], orig["average_jaccard"], atol=1e-12
    )
    np.testing.assert_allclose(
        ours["average_pts_within_thresh_per_track"][:, 0],
        orig["average_pts_within_thresh"],
        atol=1e-12,
    )
    # occlusion accuracy: the oracle pools the denominator over the batch;
    # rebuild the per-video value from per-track counts for comparison.
    t_q = ours_kw["query_points"][:, :, 0].astype(int)
    t = ours_kw["gt_tracks"].shape[1]
    if query_mode == "first":
        eval_count = t - 1 - t_q[:, 0]
    else:
        eval_count = np.full(len(t_q), t - 1)
    pooled = (
        ours["occlusion_accuracy_per_track"][:, 0] * eval_count
    ).sum() / eval_count.sum()
    # The oracle's per-video value is correct_b / total-over-batch, so the
    # batch-pooled accuracy is simply its sum.
    orig_pooled = orig["occlusion_accuracy"].sum()
    np.testing.assert_allclose(pooled, orig_pooled, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1])
def test_multi_track_pts_within_equivalence(seed):
    """With no occlusion and all queries at frame 0, every track has the
    same visible-eval count, so the per-track mean of pts_within equals the
    oracle's pooled fraction."""
    rng = np.random.default_rng(100 + seed)
    ours_kw, orig_kw = random_case(rng, b=3, n=7, t=10, query_mode="first", occlude=False)
    for kw in (ours_kw, orig_kw):
        kw["query_points"] = kw["query_points"].copy()
        kw["query_points"][..., 0] = 0
    ours = compute_tapvid_metrics(**ours_kw)
    orig = compute_tapvid_metrics_original(**orig_kw)
    for thresh in [1, 2, 4, 8, 16]:
        np.testing.assert_allclose(
            ours[f"pts_within_{thresh:.2f}_per_track"].mean(axis=1),
            orig[f"pts_within_{thresh}"],
            atol=1e-12,
        )


def test_oracle_hand_computed():
    """Pin the oracle itself to a hand-computed miniature (2 frames eval,
    one track): guards against silent drift in the port."""
    # t=3, query at frame 0 (first mode -> eval frames 1, 2).
    gt_tracks = np.zeros((1, 1, 3, 2))
    pred_tracks = np.zeros((1, 1, 3, 2))
    pred_tracks[0, 0, 1] = [3.0, 0.0]  # within 4, not within 2
    pred_tracks[0, 0, 2] = [30.0, 0.0]  # not within 16
    gt_occ = np.array([[[False, False, False]]])
    pred_occ = np.array([[[False, False, True]]])
    out = compute_tapvid_metrics_original(
        np.array([[[0.0, 0.0, 0.0]]]), gt_occ, gt_tracks, pred_occ, pred_tracks,
        "first",
    )
    # frame1 within {4,8,16}, frame2 within none -> fractions 0, 0, .5, .5, .5
    assert out["pts_within_1"][0] == 0.0
    assert out["pts_within_2"][0] == 0.0
    assert out["pts_within_4"][0] == 0.5
    assert out["pts_within_16"][0] == 0.5
    # jaccard@4: tp=1 (frame1, pred visible), gt_pos=2, fp=0 -> 1/2
    assert out["jaccard_4"][0] == 0.5
    # jaccard@1: tp=0, fp=1 (frame1 visible but outside) -> 0/3
    assert out["jaccard_1"][0] == 0.0
    # occlusion accuracy: frame1 correct, frame2 wrong -> 0.5
    assert out["occlusion_accuracy"][0] == 0.5
