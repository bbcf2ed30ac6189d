"""Monocular 2D-tracker lifting: MonocularToMultiViewAdapter (L3).

Re-design of reference `mvtracker/models/core/monocular_baselines.py:604-882`:
lifts ANY 2D point tracker to the multi-view 3D API by

1. projecting each 3D query into every view and picking the best view per
   query by a depth z-test at the query frame (reference :653-680);
2. running per-view 2D tracking for the queries assigned to that view;
3. lifting the predicted 2D tracks back to world space through the view's
   depth map (bilinear-sampled) and camera model.

The adapter is generic over a `tracker_2d` callable:

    tracker_2d(rgbs [T, H, W, 3], queries [M, 3] (t, x, y))
        -> (tracks [T, M, 2], visibility [T, M])

The reference's hub-downloaded baselines (CoTracker3, LocoTrack, ...) are
external networks; `SimpleNNTracker2D` provides a hub-free in-repo default
(template matching on image patches) so the adapter is usable and testable
hermetically. External wrappers plug in via the same callable signature.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from mvtracker_tpu.utils import geometry as geo


def pick_best_view(
    query_points: jax.Array,  # [N, 4]
    depths: jax.Array,  # [V, T, H, W]
    intrs: jax.Array,  # [V, T, 3, 3]
    extrs: jax.Array,  # [V, T, 3, 4]
) -> tuple[jax.Array, jax.Array]:
    """Assign each query to the view where it is most clearly visible.

    Per view (reference `monocular_baselines.py:653-680` selects the view
    by best depth-z agreement; no tolerance threshold exists there either):
    project the query at its own frame; views where it lands out of bounds
    or behind the camera are excluded (inf error); the best view minimizes
    the relative |z_query - depth(u, v)| error. Queries invisible in every
    view fall back to view 0, mirroring the reference's -1e4 masking.

    Returns (view_idx [N], pixel_xy [N, 2] in the chosen view).
    """
    v, t, h, w = depths.shape
    n = query_points.shape[0]
    qt = query_points[:, 0].astype(jnp.int32)
    qxyz = query_points[:, 1:]

    errors = []
    pixels = []
    for vi in range(v):
        intr_q = intrs[vi][qt]  # [N, 3, 3]
        extr_q = extrs[vi][qt]
        pix, z = geo.world_to_pixel_xy_and_camera_z(
            qxyz[:, None, :], intr_q, extr_q
        )
        pix = pix[:, 0]
        z = z[:, 0, 0]
        depth_vt = depths[vi][qt]  # [N, H, W]
        # bilinear_sample2d expects [B, H, W, C]; batch over queries:
        d_at = jax.vmap(
            lambda d, p: geo.bilinear_sample2d(
                d[None, ..., None], p[None, 0:1], p[None, 1:2]
            )[0, 0, 0]
        )(depth_vt, pix)
        in_bounds = (
            (pix[:, 0] >= 0) & (pix[:, 0] < w) & (pix[:, 1] >= 0) & (pix[:, 1] < h)
            & (z > 0)
        )
        err = jnp.abs(z - d_at) / jnp.maximum(z, 1e-6)
        err = jnp.where(in_bounds & (d_at > 0), err, jnp.inf)
        errors.append(err)
        pixels.append(pix)

    errors = jnp.stack(errors)  # [V, N]
    pixels = jnp.stack(pixels)  # [V, N, 2]
    best = jnp.argmin(errors, axis=0)  # [N]
    best = jnp.where(jnp.isinf(errors.min(axis=0)), 0, best)
    pix_best = jnp.take_along_axis(pixels, best[None, :, None], axis=0)[0]
    return best, pix_best


class MonocularToMultiViewAdapter:
    """Wraps a 2D tracker into the scene-level 3D tracking interface."""

    # Host-side numpy orchestration — the EvaluationPredictor must not jit it.
    jit_compatible = False

    def __init__(self, tracker_2d: Callable, visibility_threshold: float = 0.5):
        self.tracker_2d = tracker_2d
        self.visibility_threshold = visibility_threshold

    def __call__(
        self,
        rgbs: jax.Array,  # [V, T, H, W, 3]
        depths: jax.Array,  # [V, T, H, W]
        query_points: jax.Array,  # [N, 4]
        intrs: jax.Array,
        extrs: jax.Array,
        **kwargs,
    ) -> dict:
        v, t, h, w, _ = rgbs.shape
        n = query_points.shape[0]
        qt = np.asarray(query_points[:, 0]).astype(np.int64)

        view_idx, pix = pick_best_view(query_points, depths, intrs, extrs)
        view_idx = np.asarray(view_idx)
        pix = np.asarray(pix)

        traj = np.zeros((t, n, 3), np.float32)
        vis = np.zeros((t, n), np.float32)

        for vi in range(v):
            sel = np.where(view_idx == vi)[0]
            if len(sel) == 0:
                continue
            queries_2d = np.concatenate(
                [qt[sel, None].astype(np.float32), pix[sel]], axis=1
            )  # [M, 3] (t, x, y)
            tracks_2d, vis_2d = self.tracker_2d(rgbs[vi], jnp.asarray(queries_2d))
            tracks_2d = np.asarray(tracks_2d)  # [T, M, 2]
            vis_2d = np.asarray(vis_2d)  # [T, M]

            # Lift through this view's depth map per frame.
            intrs_inv = geo.invert_intrinsics(intrs[vi])
            extrs_inv = geo.invert_extrinsics(extrs[vi])
            z = jax.vmap(
                lambda d, p: geo.bilinear_sample2d(
                    d[None, ..., None], p[None, :, 0], p[None, :, 1]
                )[0, :, 0]
            )(depths[vi], jnp.asarray(tracks_2d))  # [T, M]
            world = geo.pixel_xy_and_camera_z_to_world(
                jnp.asarray(tracks_2d), jnp.asarray(z)[..., None], intrs_inv, extrs_inv
            )
            traj[:, sel] = np.asarray(world)
            vis[:, sel] = vis_2d

        return {
            "traj": jnp.asarray(traj),
            "vis": jnp.asarray(vis),
            "occluded": jnp.asarray(vis) < self.visibility_threshold,
        }


class SimpleNNTracker2D:
    """Hub-free 2D tracker: normalized-cross-correlation template tracking.

    A minimal stand-in for the reference's downloaded 2D baselines
    (CoTracker3 etc., `monocular_baselines.py:78-603`), enough to exercise
    and test the adapter end-to-end without network access. Tracks each
    query's image patch frame-to-frame within a local search radius.
    """

    def __init__(self, patch: int = 7, search: int = 12):
        self.patch = patch
        self.search = search

    def __call__(self, rgbs, queries):
        rgbs = np.asarray(rgbs, np.float32) / 255.0
        queries = np.asarray(queries)
        t, h, w, _ = rgbs.shape
        m = queries.shape[0]
        p, s = self.patch, self.search
        r = p // 2

        gray = rgbs.mean(-1)
        tracks = np.zeros((t, m, 2), np.float32)
        vis = np.ones((t, m), np.float32)

        for mi in range(m):
            t0 = int(queries[mi, 0])
            x, y = float(queries[mi, 1]), float(queries[mi, 2])
            xi, yi = int(round(x)), int(round(y))
            xi, yi = np.clip(xi, r, w - r - 1), np.clip(yi, r, h - r - 1)
            template = gray[t0, yi - r : yi + r + 1, xi - r : xi + r + 1]
            # Track forward from t0 and keep position fixed before t0.
            tracks[: t0 + 1, mi] = [x, y]
            cx, cy = xi, yi
            for ti in range(t0 + 1, t):
                y0, y1 = max(r, cy - s), min(h - r - 1, cy + s)
                x0, x1 = max(r, cx - s), min(w - r - 1, cx + s)
                best, bx, by = -np.inf, cx, cy
                tz = template - template.mean()
                tn = np.linalg.norm(tz) + 1e-6
                for yy in range(y0, y1 + 1):
                    for xx in range(x0, x1 + 1):
                        win = gray[ti, yy - r : yy + r + 1, xx - r : xx + r + 1]
                        wz = win - win.mean()
                        score = float((tz * wz).sum() / (tn * (np.linalg.norm(wz) + 1e-6)))
                        if score > best:
                            best, bx, by = score, xx, yy
                cx, cy = bx, by
                tracks[ti, mi] = [cx, cy]
                vis[ti, mi] = 1.0 if best > 0.5 else 0.0
                template = gray[ti, cy - r : cy + r + 1, cx - r : cx + r + 1]
        return tracks, vis
