"""Query sampling for unlabeled datasets (L6).

Re-design of the reference evaluator's unlabeled-query path
(`mvtracker/evaluation/evaluator_3dpt.py:42-59,300-403`): on datasets with
no GT tracks, evaluation queries are sampled from confident depth —
unproject depth pixels at chosen frames into world space, crop to a
vertical cylinder of interest, then either subsample uniformly or cluster
with k-means to spread the queries.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional

import numpy as np


@dataclasses.dataclass
class SamplingSpec:
    """One sampling round; mirrors the reference's per-dataset spec tuples
    (frame, zmin, zmax, radius, count, method)."""

    frame: int = 0
    zmin: float = -np.inf
    zmax: float = np.inf
    radius: float = np.inf
    count: int = 256
    method: str = ""  # "" = uniform subsample, "kmeans"
    center_xy: tuple[float, float] = (0.0, 0.0)


def kmeans_sample(pts: np.ndarray, count: int, seed: int = 0) -> np.ndarray:
    """K-means cluster centers of (N, 3) points; mirrors reference
    `evaluator_3dpt.py:42-59`."""
    if len(pts) <= count:
        return pts
    from sklearn.cluster import KMeans

    t0 = time.time()
    km = KMeans(n_clusters=count, n_init="auto", random_state=seed).fit(pts)
    logging.info("k-means (k=%d, N=%d) in %.2fs", count, len(pts), time.time() - t0)
    return km.cluster_centers_.astype(pts.dtype)


def sample_queries_from_depth(
    depths: np.ndarray,  # [V, T, H, W]
    intrs: np.ndarray,  # [V, T, 3, 3]
    extrs: np.ndarray,  # [V, T, 3, 4]
    specs: list[SamplingSpec],
    depth_conf: Optional[np.ndarray] = None,  # [V, T, H, W]
    conf_threshold: float = 0.0,
    stride: int = 4,
    seed: int = 0,
) -> np.ndarray:
    """Sample evaluation queries [(t, x, y, z)] from (confident) depth.

    Mirrors the reference's cylinder-crop + kmeans sampling
    (`evaluator_3dpt.py:300-403`). Returns [sum(counts), 4].
    """
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    rng = np.random.default_rng(seed)
    v = depths.shape[0]
    out = []
    for spec in specs:
        t = spec.frame
        pts_all = []
        for vi in range(v):
            d = depths[vi, t, ::stride, ::stride]
            valid = d > 0
            if depth_conf is not None:
                valid &= depth_conf[vi, t, ::stride, ::stride] > conf_threshold
            world = np.asarray(
                geo.unproject_depth_to_world(
                    jnp.asarray(d)[None],
                    geo.invert_intrinsics(jnp.asarray(intrs[vi, t]))[None],
                    geo.invert_extrinsics(jnp.asarray(extrs[vi, t]))[None],
                    stride,
                )[0]
            )
            pts_all.append(world[valid])
        pts = np.concatenate(pts_all, axis=0)

        # Cylinder crop around center_xy.
        x = pts[:, 0] - spec.center_xy[0]
        y = pts[:, 1] - spec.center_xy[1]
        z = pts[:, 2]
        mask = (x**2 + y**2 < spec.radius**2) & (z >= spec.zmin) & (z <= spec.zmax)
        pts = pts[mask]
        if len(pts) == 0:
            continue

        if spec.method == "kmeans":
            chosen = kmeans_sample(pts, spec.count, seed)
        else:
            idx = rng.choice(len(pts), size=min(spec.count, len(pts)), replace=False)
            chosen = pts[idx]
        tcol = np.full((len(chosen), 1), float(t), chosen.dtype)
        out.append(np.concatenate([tcol, chosen], axis=1))
    if not out:
        return np.zeros((0, 4), np.float32)
    return np.concatenate(out, axis=0).astype(np.float32)
