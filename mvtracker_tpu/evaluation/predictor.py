"""Evaluation predictor (L5): inference-time wrapper around the tracker.

Re-design of the reference `EvaluationPredictor`
(`mvtracker/models/evaluation_predictor_3dpt.py:17-414`):

- optional nearest resize of rgb/depth to `interp_shape` with intrinsics
  rescale (reference :71-87);
- support-point augmentation: a pixel grid per view (optionally at several
  frames) unprojected through the depth map into world space (reference
  :101-120), plus uniformly-sampled random support points (:147-189);
- queries and support points run through the model together; only the
  original queries' tracks are returned; visibility is thresholded.

All support-point construction is static-shaped jittable JAX.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from mvtracker_tpu.utils import geometry as geo


def nearest_resize(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbor resize over the last two (or [-3,-2] for NHWC-like
    trailing channel) spatial axes of [..., H, W]. torch F.interpolate
    'nearest' picks src index floor(i * H_in / H_out)."""
    h, w = x.shape[-2], x.shape[-1]
    ri = (np.arange(out_h) * h // out_h).astype(np.int32)
    ci = (np.arange(out_w) * w // out_w).astype(np.int32)
    return x[..., ri[:, None], ci[None, :]]


def build_support_grid_points(
    depths: jax.Array,  # [V, T, H, W]
    intrs: jax.Array,  # [V, T, 3, 3]
    extrs: jax.Array,  # [V, T, 3, 4]
    grid_size: int,
    n_grids_per_view: int = 1,
) -> jax.Array:
    """Support grid: grid_size^2 pixels per view unprojected through depth.

    Mirrors reference `evaluation_predictor_3dpt.py:101-120`. Returns
    [n_frames_used * V * grid_size^2, 4] (t, xyz).
    """
    v, t, h, w = depths.shape
    pix = geo.get_points_on_a_grid(grid_size, (h, w))[0]  # [G, 2]
    intrs_inv = geo.invert_intrinsics(intrs)
    extrs_inv = geo.invert_extrinsics(extrs)

    frames = list(range(0, t, max(1, t // n_grids_per_view)))
    pts = []
    for ti in frames:
        for vi in range(v):
            z = geo.bilinear_sample2d(
                depths[vi, ti][None, :, :, None], pix[None, :, 0], pix[None, :, 1]
            )[0]  # [G, 1]
            world = geo.pixel_xy_and_camera_z_to_world(
                pix[None], z[None], intrs_inv[vi, ti][None], extrs_inv[vi, ti][None]
            )[0]  # [G, 3]
            pts.append(
                jnp.concatenate([jnp.full((world.shape[0], 1), float(ti)), world], axis=1)
            )
    return jnp.concatenate(pts, axis=0)


def build_uniform_support_points(
    depths: jax.Array,  # [V, T, H, W]
    intrs: jax.Array,
    extrs: jax.Array,
    num_points: int,
    rng_key: jax.Array,
) -> jax.Array:
    """Random (t, x, y) samples unprojected in every view; mirrors reference
    `evaluation_predictor_3dpt.py:147-189`. Returns [num_points * V, 4]."""
    v, t, h, w = depths.shape
    k1, k2, k3 = jax.random.split(rng_key, 3)
    ts = jax.random.randint(k1, (num_points,), 0, t)
    xs = jax.random.uniform(k2, (num_points,), minval=0.0, maxval=w - 1.0)
    ys = jax.random.uniform(k3, (num_points,), minval=0.0, maxval=h - 1.0)

    intrs_inv = geo.invert_intrinsics(intrs)
    extrs_inv = geo.invert_extrinsics(extrs)

    pts = []
    for vi in range(v):
        # Gather depth at (t, y, x) per sample with bilinear interpolation.
        z = geo.bilinear_sample2d(
            depths[vi].transpose(1, 2, 0)[None],  # [1, H, W, T] channels=T
            xs[None],
            ys[None],
        )[0]  # [num_points, T]
        z_t = jnp.take_along_axis(z, ts[:, None], axis=1)  # [num_points, 1]
        ki = jnp.take(intrs_inv[vi], ts, axis=0)  # [num_points, 3, 3]
        ei = jnp.take(extrs_inv[vi], ts, axis=0)
        pix = jnp.stack([xs, ys], axis=-1)  # [num_points, 2]
        world = geo.pixel_xy_and_camera_z_to_world(
            pix[:, None, :], z_t[:, :, None], ki, ei
        )[:, 0]
        pts.append(jnp.concatenate([ts[:, None].astype(jnp.float32), world], axis=1))
    return jnp.concatenate(pts, axis=0)


class EvaluationPredictor:
    """Wraps a tracker (scene-level flax model + params) for evaluation."""

    def __init__(
        self,
        model,
        params,
        interp_shape: Optional[tuple[int, int]] = (384, 512),
        visibility_threshold: float = 0.5,
        grid_size: int = 5,
        n_grids_per_view: int = 1,
        num_uniformly_sampled_pts: int = 0,
        n_iters: int = 6,
        single_point: bool = False,
        local_grid_size: int = 8,
        local_extent: int = 50,
        consume_model_stats: bool = False,
        chunk_frames: Optional[int] = None,
    ):
        self.model = model
        self.params = params
        self.interp_shape = interp_shape
        self.visibility_threshold = visibility_threshold
        self.grid_size = grid_size
        self.n_grids_per_view = n_grids_per_view
        self.num_uniformly_sampled_pts = num_uniformly_sampled_pts
        self.n_iters = n_iters
        self.single_point = single_point
        self.local_grid_size = local_grid_size
        self.local_extent = local_extent
        # Model-internal kNN statistics (reference `consume_model_stats`,
        # `cli/train.py:264-275`): requires a model built with
        # `collect_stats=True`; after each __call__, `last_model_stats`
        # holds the aggregated pandas table.
        self.consume_model_stats = consume_model_stats
        self.last_model_stats = None
        # Temporal chunking for long videos (reference demo chunks frame
        # batches, `demo.py:694-880`): segments of `chunk_frames` frames run
        # through one reused compiled graph; track positions on the shared
        # boundary frame seed the next segment's queries (segments overlap
        # by one frame, so the seed is frame-consistent). Bounds HBM to
        # O(V * chunk_frames) feature maps / fused clouds regardless of T.
        # None (or any value < 2) disables.
        self.chunk_frames = (
            int(chunk_frames) if chunk_frames and int(chunk_frames) >= 2 else None
        )
        self._jitted = {}

    def _forward(self, rgbs, depths, queries, intrs, extrs):
        key = (rgbs.shape, queries.shape)
        if key not in self._jitted:
            model, n_iters = self.model, self.n_iters

            if hasattr(model, "apply") and self.consume_model_stats:

                @jax.jit
                def f(params, rgbs, depths, queries, intrs, extrs):
                    out, variables = model.apply(
                        params, rgbs, depths, queries, intrs, extrs, iters=n_iters,
                        mutable=["intermediates"],
                    )
                    return out["traj"], out["vis"], variables["intermediates"]

            elif hasattr(model, "apply"):

                @jax.jit
                def f(params, rgbs, depths, queries, intrs, extrs):
                    out = model.apply(
                        params, rgbs, depths, queries, intrs, extrs, iters=n_iters
                    )
                    return out["traj"], out["vis"]

            elif getattr(model, "jit_compatible", True):
                # Parameterless baselines (CopyCat, cached predictors):
                # plain callables with the same signature, params ignored.
                @jax.jit
                def f(params, rgbs, depths, queries, intrs, extrs):
                    out = model(rgbs, depths, queries, intrs, extrs)
                    return out["traj"], out["vis"]

            else:
                # Host-side baselines (MonocularToMultiViewAdapter: numpy
                # per-view loops around a 2D tracker) run eagerly.
                def f(params, rgbs, depths, queries, intrs, extrs):
                    out = model(rgbs, depths, queries, intrs, extrs)
                    return out["traj"], out["vis"]

            self._jitted[key] = f
        out = self._jitted[key](self.params, rgbs, depths, queries, intrs, extrs)
        if len(out) == 3:
            from mvtracker_tpu.models.mvtracker import consume_stats

            traj, vis, intermediates = out
            self.last_model_stats = consume_stats(intermediates)
            return traj, vis
        return out

    def _forward_fused(self, rgbs, depths, query_points, intrs, extrs, rng_key):
        """The common eval path as ONE jitted dispatch: resize + intrinsics
        rescale + support-grid construction + model forward + output slice.

        Round-3's bench measured `eval_fps_with_support_grids` falling
        72.7 -> 52.1 with zero predictor-code change in between: the eager
        per-op dispatch of the support-grid build (~40 tiny ops: bilinear
        depth samples, unprojections, concats) is tunnel-RTT-bound, so the
        published number tracked session latency, not the framework. Fusing
        the whole pipeline into the jitted graph removes the per-op
        round-trips (and lets XLA fuse the grid build into the forward's
        prologue). The eager building blocks remain for the single-point /
        chunked / host-side-baseline paths.
        """
        sig = (
            "fused", rgbs.shape, depths.shape, query_points.shape,
            intrs.shape, extrs.shape,
        )
        if sig not in self._jitted:
            model, n_iters = self.model, self.n_iters
            interp = self.interp_shape
            grid_size, n_grids = self.grid_size, self.n_grids_per_view
            n_uniform = self.num_uniformly_sampled_pts
            n = query_points.shape[0]
            is_flax = hasattr(model, "apply")

            @jax.jit
            def f(params, rgbs, depths, query_points, intrs, extrs, key):
                v, t, h_raw, w_raw, _ = rgbs.shape
                if interp is not None:
                    h, w = interp
                    rgbs = nearest_resize(
                        rgbs.transpose(0, 1, 4, 2, 3), h, w
                    ).transpose(0, 1, 3, 4, 2)
                    depths = nearest_resize(depths, h, w)
                    scale = jnp.asarray(
                        [[w / w_raw, 0, 0], [0, h / h_raw, 0], [0, 0, 1]],
                        intrs.dtype,
                    )
                    intrs = jnp.einsum("ij,VTjk->VTik", scale, intrs)
                support = []
                if grid_size > 0:
                    support.append(
                        build_support_grid_points(
                            depths, intrs, extrs, grid_size, n_grids
                        )
                    )
                if n_uniform > 0:
                    support.append(
                        build_uniform_support_points(
                            depths, intrs, extrs, n_uniform, key
                        )
                    )
                queries = (
                    jnp.concatenate([query_points] + support, axis=0)
                    if support
                    else query_points
                )
                if is_flax:
                    out = model.apply(
                        params, rgbs, depths, queries, intrs, extrs, iters=n_iters
                    )
                else:
                    out = model(rgbs, depths, queries, intrs, extrs)
                return out["traj"][:, :n], out["vis"][:, :n]

            self._jitted[sig] = f
        return self._jitted[sig](
            self.params, rgbs, depths, query_points, intrs, extrs, rng_key
        )

    def __call__(
        self,
        rgbs: jax.Array,  # [V, T, H, W, 3] 0..255
        depths: jax.Array,  # [V, T, H, W]
        query_points: jax.Array,  # [N, 4]
        intrs: jax.Array,  # [V, T, 3, 3]
        extrs: jax.Array,  # [V, T, 3, 4]
        rng_key: Optional[jax.Array] = None,
    ):
        v, t, h_raw, w_raw, _ = rgbs.shape
        n = query_points.shape[0]

        if (
            not self.single_point
            and not self.consume_model_stats
            and getattr(self.model, "jit_compatible", True)
            and not (self.chunk_frames is not None and t > self.chunk_frames)
        ):
            traj, vis = self._forward_fused(
                rgbs, depths, query_points, intrs, extrs,
                rng_key if rng_key is not None else jax.random.PRNGKey(0),
            )
            return {
                "traj": traj,
                "vis": vis,
                "occluded": vis < self.visibility_threshold,
            }

        if self.interp_shape is not None:
            h, w = self.interp_shape
            rgbs = nearest_resize(rgbs.transpose(0, 1, 4, 2, 3), h, w).transpose(0, 1, 3, 4, 2)
            depths = nearest_resize(depths, h, w)
            scale = jnp.asarray(
                [[w / w_raw, 0, 0], [0, h / h_raw, 0], [0, 0, 1]], intrs.dtype
            )
            intrs = jnp.einsum("ij,VTjk->VTik", scale, intrs)

        support = []
        if self.grid_size > 0:
            support.append(
                build_support_grid_points(
                    depths, intrs, extrs, self.grid_size, self.n_grids_per_view
                )
            )
        if self.num_uniformly_sampled_pts > 0:
            key = rng_key if rng_key is not None else jax.random.PRNGKey(0)
            support.append(
                build_uniform_support_points(
                    depths, intrs, extrs, self.num_uniformly_sampled_pts, key
                )
            )

        if self.single_point:
            return self._forward_single_point(
                rgbs, depths, query_points, intrs, extrs, support
            )

        queries = query_points
        if support:
            queries = jnp.concatenate([query_points] + support, axis=0)

        if self.chunk_frames is not None and t > self.chunk_frames:
            traj, vis = self._forward_chunked(rgbs, depths, queries, intrs, extrs)
        else:
            traj, vis = self._forward(rgbs, depths, queries, intrs, extrs)
        traj = traj[:, :n]
        vis = vis[:, :n]
        return {
            "traj": traj,
            "vis": vis,
            "occluded": vis < self.visibility_threshold,
        }

    def _forward_chunked(self, rgbs, depths, queries, intrs, extrs):
        """Track a long video in fixed-size temporal segments.

        TPU re-design of the reference demo's frame-batch chunking
        (`demo.py:694-880`): every segment has the same static shape
        ([V, chunk_frames, H, W, ...]), so ONE compiled graph is reused for
        all of them (the last segment is edge-padded and its padding
        dropped). Consecutive segments share one boundary frame: a track
        already started re-enters the next segment as a query at relative
        t=0 placed at its predicted position ON that shared frame (no
        temporal lag in the seed). Tracks starting inside the segment use
        their original query; tracks starting later carry a start time
        beyond the segment's last window, so the model's active mask keeps
        them out of the shared attention entirely, and their rows are
        masked out of the stitched result.
        """
        v, t = rgbs.shape[:2]
        chunk = int(self.chunk_frames)
        n = queries.shape[0]
        # Host-side control flow: query start times drive segment assembly.
        qt = np.asarray(queries[:, 0]).astype(np.int64)  # [N]
        qxyz = queries[:, 1:]  # [N, 3] (device)
        # A start time safely past every window of a segment: the model's
        # active set needs query_t < w_start + S with w_start < chunk, so
        # chunk + S is inert for ANY chunk/window-length combination
        # (2*chunk would leak for chunk_frames < sliding_window_len).
        inert_t = chunk + int(getattr(self.model, "sliding_window_len", chunk))

        def seg_frames(x, t0, length):
            sl = jax.lax.slice_in_dim(x, t0, t0 + length, axis=1)
            if length < chunk:  # edge-pad the tail segment to the static shape
                last = jax.lax.slice_in_dim(x, t0 + length - 1, t0 + length, axis=1)
                reps = jnp.concatenate([last] * (chunk - length), axis=1)
                sl = jnp.concatenate([sl, reps], axis=1)
            return sl

        cur_xyz = qxyz
        traj_parts, vis_parts = [], []
        t0 = 0
        while True:
            length = min(chunk, t - t0)
            started = qt < t0
            inside = (qt >= t0) & (qt < t0 + chunk)
            rel_t = np.where(started, 0, np.where(inside, qt - t0, inert_t))
            seg_xyz = jnp.where(jnp.asarray(started)[:, None], cur_xyz, qxyz)
            seg_queries = jnp.concatenate(
                [jnp.asarray(rel_t, queries.dtype)[:, None], seg_xyz], axis=1
            )
            traj_s, vis_s = self._forward(
                seg_frames(rgbs, t0, length),
                seg_frames(depths, t0, length),
                seg_queries,
                seg_frames(intrs, t0, length),
                seg_frames(extrs, t0, length),
            )
            # The shared boundary frame (local 0) was already emitted by the
            # previous segment.
            offset = 0 if t0 == 0 else 1
            traj_parts.append(traj_s[offset:length])
            vis_parts.append(vis_s[offset:length])
            # Positions on the segment's final frame — the next segment's
            # local frame 0 — seed its chained queries.
            cur_xyz = jnp.where(
                jnp.asarray(qt < t0 + length)[:, None], traj_s[length - 1], cur_xyz
            )
            if t0 + length >= t:
                break
            t0 += chunk - 1  # overlap by one frame

        traj = jnp.concatenate(traj_parts, axis=0)  # [T, N, 3]
        vis = jnp.concatenate(vis_parts, axis=0)  # [T, N]
        # Re-mask with the TRUE start times (segments before a track's
        # start computed placeholder rows for it).
        alive = jnp.arange(t)[:, None] >= jnp.asarray(qt)[None, :]
        return jnp.where(alive[..., None], traj, 0.0), jnp.where(alive, vis, 0.0)

    def _local_grid_points(self, depths, intrs, extrs, query):
        """Local support grid around one query's projection in every view.

        Mirrors reference `evaluation_predictor_3dpt.py:191-339`: project the
        query into each view at its query frame, lay a local_grid_size^2
        pixel grid of local_extent pixels around the projection, unproject
        through the depth map.
        """
        v, t, h, w = depths.shape
        g = self.local_grid_size
        qt = query[0].astype(jnp.int32)
        qxyz = query[1:]

        intrs_inv = geo.invert_intrinsics(intrs)
        extrs_inv = geo.invert_extrinsics(extrs)

        pts = []
        for vi in range(v):
            intr = jnp.take(intrs[vi], qt, axis=0)
            extr = jnp.take(extrs[vi], qt, axis=0)
            pix, _ = geo.world_to_pixel_xy_and_camera_z(
                qxyz[None, None, :], intr[None], extr[None]
            )
            cx, cy = pix[0, 0, 0], pix[0, 0, 1]
            half = self.local_extent / 2
            lin = jnp.linspace(-half, half, g)
            gx, gy = jnp.meshgrid(cx + lin, cy + lin, indexing="xy")
            grid = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)  # [G2, 2]
            grid = jnp.clip(
                grid, jnp.zeros((2,)), jnp.asarray([w - 1.0, h - 1.0])
            )
            depth_q = jnp.take(depths[vi], qt, axis=0)  # [H, W]
            z = geo.bilinear_sample2d(
                depth_q[None, :, :, None], grid[None, :, 0], grid[None, :, 1]
            )[0]
            world = geo.pixel_xy_and_camera_z_to_world(
                grid[None],
                z[None],
                jnp.take(intrs_inv[vi], qt, axis=0)[None],
                jnp.take(extrs_inv[vi], qt, axis=0)[None],
            )[0]
            tcol = jnp.full((world.shape[0], 1), query[0])
            pts.append(jnp.concatenate([tcol, world], axis=1))
        return jnp.concatenate(pts, axis=0)

    def _forward_single_point(self, rgbs, depths, query_points, intrs, extrs, support):
        """One model run per query with a local support grid
        (reference single_point mode, `evaluation_predictor_3dpt.py:191-339`)."""
        n = query_points.shape[0]
        trajs, viss = [], []
        for i in range(n):
            q = query_points[i]
            local = self._local_grid_points(depths, intrs, extrs, q)
            queries = jnp.concatenate([q[None]] + [local] + support, axis=0)
            traj, vis = self._forward(rgbs, depths, queries, intrs, extrs)
            trajs.append(traj[:, 0])
            viss.append(vis[:, 0])
        traj = jnp.stack(trajs, axis=1)
        vis = jnp.stack(viss, axis=1)
        return {
            "traj": traj,
            "vis": vis,
            "occluded": vis < self.visibility_threshold,
        }
