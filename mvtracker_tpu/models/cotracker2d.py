"""Compact learned monocular 2D tracker (CoTracker-style) — L3.

Fills the role of the reference's hub-downloaded 2D baselines
(`mvtracker/models/core/monocular_baselines.py:78-127` CoTracker wrappers):
an IN-REPO, trainable 2D point tracker that `MonocularToMultiViewAdapter`
can lift to the multi-view 3D API, with no external checkpoints.

Architecturally it is the CoTracker2 recipe (reference
`mvtracker/models/core/cotracker2/blocks.py`: CNN feature pyramid +
patch-correlation CorrBlock + factorized update transformer over a sliding
window) expressed as a variant of this framework's MVTracker base class —
the same subclassing pattern as the triplane `MultiViewSpaTracker`:

- `_build_context` builds an average-pooled fmap pyramid of the single view
  (instead of fused 3D clouds);
- `_corr_features` bilinear-samples a (2r+1)^2 patch around the track's
  position at every pyramid level and correlates with the track feature —
  the 2D CorrBlock (`spatracker/blocks.py:423-535`);
- `_feat_init` bilinear-samples the level-0 fmap at the query pixel.

Track state is (x, y, z) with z supervised to 0 — the base class's window
chaining, active-set masking, iterative refinement, and loss all apply
unchanged, so the 2D tracker inherits the whole training/eval stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mvtracker_tpu.models.mvtracker import MVTracker
from mvtracker_tpu.utils import geometry as geo


class CoTracker2D(MVTracker):
    """Monocular 2D tracker; expects V=1 inputs.

    Depths/intrinsics/extrinsics are accepted (same calling convention as
    every model in the framework) but ignored — tracking is purely image
    space, like the reference's 2D baselines.
    """

    corr_patch_radius: int = 3

    @property
    def updateformer_input_dim(self) -> int:
        patch = (2 * self.corr_patch_radius + 1) ** 2
        return (
            (self.flow_embed_dim + 1) * 3
            + self.corr_n_levels * patch
            + self.fmaps_dim
            + 1
            + 1
        )

    # -- context -------------------------------------------------------

    def _build_context(self, fmaps, depths_strided, intrs, extrs):
        """Average-pooled fmap pyramid of the (single) view.

        Returns dict of per-frame leaves: pyramid_{l}: [T, h_l, w_l, C].
        """
        del depths_strided, intrs, extrs
        v, t, h, w, c = fmaps.shape
        assert v == 1, f"CoTracker2D is monocular; got V={v}"
        level = fmaps[0]  # [T, h, w, C]
        context = {}
        for lvl in range(self.corr_n_levels):
            if lvl > 0:
                level = geo.avg_pool_2x2(
                    level.transpose(0, 3, 1, 2)
                ).transpose(0, 2, 3, 1)
            context[f"pyramid_{lvl}"] = level
        return context

    def _feat_init(self, context, query_t, query_xyz):
        """Bilinear level-0 feature at the query pixel on its start frame."""
        fmap0 = context["pyramid_0"]  # [T, h, w, C]
        t = fmap0.shape[0]
        n = query_xyz.shape[0]
        xy = query_xyz[:, :2] / self.stride
        x = jnp.broadcast_to(xy[None, :, 0], (t, n))
        y = jnp.broadcast_to(xy[None, :, 1], (t, n))
        feats = geo.bilinear_sample2d(fmap0, x, y)  # [T, N, C]
        return jnp.take_along_axis(
            feats, query_t[None, :, None], axis=0, mode="clip"
        )[0]

    # -- correlation ---------------------------------------------------

    def _corr_knn(self, context_w, coords):
        # No kNN stage; corr_knn_reuse is a no-op (like the triplane variant).
        return None

    def _corr_features(self, context_w, coords, ffeats, knn_cache=None):
        """Patch-pyramid correlation around (x, y) at each level.

        coords: [S, N, 3] pixel coords (z supervised to 0, unused here).
        Returns [S, N, L * patch].
        """
        s, n, _ = coords.shape
        rad = self.corr_patch_radius
        dy, dx = jnp.meshgrid(
            jnp.arange(-rad, rad + 1, dtype=jnp.float32),
            jnp.arange(-rad, rad + 1, dtype=jnp.float32),
            indexing="ij",
        )
        offsets = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # [P2, 2]
        p2 = offsets.shape[0]

        compute_dtype = (
            jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        )
        out = []
        for lvl in range(self.corr_n_levels):
            fmap = context_w[f"pyramid_{lvl}"]  # [S, h_l, w_l, C]
            c = fmap.shape[-1]
            centers = coords[..., :2] / (self.stride * 2.0**lvl)  # [S, N, 2]
            pts = centers[:, :, None, :] + offsets[None, None]  # [S, N, P2, 2]
            pts = pts.reshape(s, n * p2, 2)
            sampled = geo.bilinear_sample2d(
                fmap, pts[..., 0], pts[..., 1]
            ).reshape(s, n, p2, c)
            corr = jnp.einsum(
                "snc,snpc->snp",
                ffeats.astype(compute_dtype),
                sampled.astype(compute_dtype),
            ).astype(jnp.float32) / np.sqrt(c)
            out.append(corr)
        return jnp.concatenate(out, axis=-1)  # [S, N, L*P2]


class LearnedTracker2D:
    """Adapter-compatible callable around a trained CoTracker2D.

    Satisfies the `tracker_2d(rgbs [T,H,W,3], queries [M,3] (t,x,y)) ->
    (tracks [T,M,2], visibility [T,M])` contract of
    `MonocularToMultiViewAdapter` (reference wrappers' role,
    `monocular_baselines.py:78-127`).
    """

    def __init__(self, model: CoTracker2D, params=None, n_iters: int = 4):
        self.model = model
        self.params = params  # None: random init on first call (smoke paths)
        self.n_iters = n_iters
        self._fwd = jax.jit(
            lambda params, rgbs, queries: self.model.apply(
                params,
                rgbs[None],  # V=1
                jnp.zeros_like(rgbs[..., 0])[None],  # depths (ignored)
                queries,
                jnp.broadcast_to(jnp.eye(3), (1, rgbs.shape[0], 3, 3)),
                jnp.broadcast_to(jnp.eye(3, 4), (1, rgbs.shape[0], 3, 4)),
                iters=self.n_iters,
            )
        )

    def __call__(self, rgbs, queries):
        rgbs = jnp.asarray(rgbs, jnp.float32)
        queries = jnp.asarray(queries, jnp.float32)
        q4 = jnp.concatenate(
            [queries, jnp.zeros((queries.shape[0], 1), jnp.float32)], axis=1
        )  # (t, x, y, 0)
        if self.params is None:
            t = rgbs.shape[0]
            self.params = jax.jit(
                lambda k: self.model.init(
                    k,
                    rgbs[None],
                    jnp.zeros_like(rgbs[..., 0])[None],
                    q4,
                    jnp.broadcast_to(jnp.eye(3), (1, t, 3, 3)),
                    jnp.broadcast_to(jnp.eye(3, 4), (1, t, 3, 4)),
                    iters=1,
                )
            )(jax.random.PRNGKey(0))
        out = self._fwd(self.params, rgbs, q4)
        return out["traj"][..., :2], out["vis"]
