"""Misc utilities (L0): farthest-point sampling, trajectory error stats.

Mirrors reference `mvtracker/utils/misc.py:117-153` (FPS) and
`mvtracker/utils/eval_utils.py` (median/average trajectory error).
"""

from __future__ import annotations

import numpy as np


def farthest_point_sampling(points: np.ndarray, n_samples: int, seed: int = 0) -> np.ndarray:
    """Greedy farthest-point subset of [N, D] points; returns indices [n_samples].

    Mirrors reference `utils/misc.py:117-153`.
    """
    n = len(points)
    if n_samples >= n:
        return np.arange(n)
    rng = np.random.default_rng(seed)
    chosen = np.empty(n_samples, np.int64)
    chosen[0] = rng.integers(n)
    dists = np.linalg.norm(points - points[chosen[0]], axis=-1)
    for i in range(1, n_samples):
        chosen[i] = int(np.argmax(dists))
        dists = np.minimum(dists, np.linalg.norm(points - points[chosen[i]], axis=-1))
    return chosen


def trajectory_errors(
    pred: np.ndarray,  # [T, N, D]
    gt: np.ndarray,  # [T, N, D]
    visibility: np.ndarray | None = None,  # [T, N]
) -> dict[str, float]:
    """Median/average per-point trajectory errors (reference
    `utils/eval_utils.py`)."""
    d = np.linalg.norm(pred - gt, axis=-1)
    if visibility is not None:
        d = np.where(visibility, d, np.nan)
    return {
        "median_error": float(np.nanmedian(d)),
        "mean_error": float(np.nanmean(d)),
    }
