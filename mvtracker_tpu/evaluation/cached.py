"""Cached-prediction predictor (L5): optimization-based baseline path.

The reference evaluates offline per-scene optimization baselines
(Dynamic3DGS, Shape-of-Motion) by reading precomputed `*_tracks.npz`
prediction files instead of running a model
(`mvtracker/evaluation/evaluator_3dpt.py:497-514`). This predictor provides
the same path: drop npz files with keys {traj [T, N, 3], vis [T, N]} (or
the reference's {tracks, visibilities}) into a directory named by sequence.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class CachedPredictionPredictor:
    """Looks up `<cache_dir>/<seq_name>_tracks.npz` per sequence."""

    def __init__(self, cache_dir: str, visibility_threshold: float = 0.5):
        self.cache_dir = cache_dir
        self.visibility_threshold = visibility_threshold
        self._current_seq: Optional[str] = None

    def set_sequence(self, seq_name: str):
        self._current_seq = seq_name

    def __call__(self, rgbs, depths, query_points, intrs, extrs, **kwargs):
        import jax.numpy as jnp

        assert self._current_seq is not None, "call set_sequence(seq_name) first"
        path = os.path.join(self.cache_dir, f"{self._current_seq}_tracks.npz")
        data = np.load(path)
        traj = data["traj"] if "traj" in data else data["tracks"]
        vis = data["vis"] if "vis" in data else data["visibilities"]
        t = rgbs.shape[1]
        n = query_points.shape[0]
        assert traj.shape == (t, n, 3), f"cached traj shape {traj.shape} != {(t, n, 3)}"
        vis = vis.astype(np.float32)
        return {
            "traj": jnp.asarray(traj, jnp.float32),
            "vis": jnp.asarray(vis),
            "occluded": jnp.asarray(vis) < self.visibility_threshold,
        }
