"""Multi-view SpaTracker: global-triplane tracking variant (L3).

TPU-native re-design of the reference `MultiViewSpaTracker`
(`mvtracker/models/core/spatracker/spatracker_multiview.py:21-959`): instead
of kNN into a fused cloud, the fused world-space feature points are splatted
onto three world-aligned planes (XY, YZ, XZ) per frame; correlation samples
a bilinear patch pyramid from each plane around the track's projected
coordinates. The shared pieces (encoder, update transformer, sliding-window
scan, feature/visibility heads) come from the MVTracker base class — only
`_build_context`, `_feat_init`, and `_corr_features` differ.

Splatting runs as XLA scatter-add (`ops/splat.py`) — the reference needs a
hand-written CUDA kernel + custom autograd for this
(`spatracker/softsplat.py:288-450`); on TPU the scatter's VJP is a gather
and comes for free.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvtracker_tpu.models.mvtracker import MVTracker
from mvtracker_tpu.ops.splat import splat_points
from mvtracker_tpu.utils import geometry as geo


class MultiViewSpaTracker(MVTracker):
    """Triplane variant. Extra hyperparameters:

    - triplane_res: square resolution of each plane;
    - corr_patch_radius: bilinear patch radius per pyramid level (the
      reference CorrBlock uses radius 3 -> 7x7 patches,
      `spatracker/blocks.py:423-535`).
    """

    triplane_res: int = 64
    corr_patch_radius: int = 3
    # Reference SpaTracker carries a 100-token LoFTR support-feature bank
    # in its update former (`spatracker_multiview.py:112-113`).
    support_memory_tokens: int = 100

    @property
    def updateformer_input_dim(self) -> int:
        patch = (2 * self.corr_patch_radius + 1) ** 2
        return (
            (self.flow_embed_dim + 1) * 3
            + 3 * self.corr_n_levels * patch
            + self.fmaps_dim
            + 1
            + 1
        )

    # -- context -------------------------------------------------------

    def _build_context(self, fmaps, depths_strided, intrs, extrs):
        """Per-frame triplanes from the fused cloud.

        Returns dict with per-frame leaves:
          planes: [T, 3, R, R, C] (XY, YZ, XZ stacked),
          bbox_lo/bbox_hi: [T, 3] (identical rows — clip-global bbox,
          broadcast per frame so the window scan can gather uniformly).
        """
        xyz, fvec = geo.init_pointcloud_from_rgbd(
            fmaps[None], depths_strided[None], intrs[None], extrs[None],
            stride=self.stride, level=0,
        )  # [T, P, 3], [T, P, C]
        t, p, c = fvec.shape
        r = self.triplane_res

        # Clip-global bbox (stop-gradient; reference normalizes the world
        # into the triplane grid, `spatracker_multiview.py:540-560`).
        lo = jax.lax.stop_gradient(xyz.reshape(-1, 3).min(axis=0))
        hi = jax.lax.stop_gradient(xyz.reshape(-1, 3).max(axis=0))
        scale = (r - 1) / jnp.maximum(hi - lo, 1e-6)

        grid = (xyz - lo) * scale  # [T, P, 3] in [0, R-1]
        zero_metric = jnp.zeros((t, p))

        planes = []
        for axes in ((0, 1), (1, 2), (0, 2)):  # XY, YZ, XZ
            pts2 = grid[..., list(axes)]
            planes.append(splat_points(pts2, fvec, zero_metric, r, r))
        planes = jnp.stack(planes, axis=1)  # [T, 3, R, R, C]

        return {
            "planes": planes,
            "bbox_lo": jnp.broadcast_to(lo[None], (t, 3)),
            "scale": jnp.broadcast_to(scale[None], (t, 3)),
        }

    def _feat_init(self, context, query_t, query_xyz):
        """Trilinear triplane feature at the query position/frame: mean of
        the three plane samples (standard triplane decoding)."""
        planes = context["planes"]  # [T, 3, R, R, C]
        lo = context["bbox_lo"][0]
        scale = context["scale"][0]
        t = planes.shape[0]
        n = query_xyz.shape[0]

        grid = (query_xyz - lo[None]) * scale[None]  # [N, 3]
        feats = []
        for pi, axes in enumerate(((0, 1), (1, 2), (0, 2))):
            pl = planes[:, pi]  # [T, R, R, C]
            x = jnp.broadcast_to(grid[None, :, axes[0]], (t, n))
            y = jnp.broadcast_to(grid[None, :, axes[1]], (t, n))
            feats.append(geo.bilinear_sample2d(pl, x, y))  # [T, N, C]
        feats = sum(feats) / 3.0
        # mode="clip": chunked long-video tracking seeds not-yet-started
        # tracks with a start time past the segment length; the default
        # out-of-range gather fill is NaN, which would spread to every
        # track through attention (same fix as the base class,
        # `mvtracker.py::_feat_init`).
        return jnp.take_along_axis(
            feats, query_t[None, :, None], axis=0, mode="clip"
        )[0]

    # -- correlation ---------------------------------------------------

    def _corr_knn(self, context_w, coords):
        # The triplane variant has no kNN stage; corr_knn_reuse is a no-op.
        return None

    def _corr_features(self, context_w, coords, ffeats, knn_cache=None):
        # knn_cache is always None here (see _corr_knn).
        """Patch-pyramid correlation on the three planes.

        For each pyramid level l (plane average-pooled 2^l times) and plane
        q, sample a (2r+1)^2 bilinear patch around the track's projected
        grid coords and correlate with the track feature — the CorrBlock
        pattern (`spatracker/blocks.py:423-535`) applied to world planes.
        Returns [S, N, 3 * L * patch].
        """
        planes = context_w["planes"]  # [S, 3, R, R, C]
        lo = context_w["bbox_lo"][:, None, :]  # [S, 1, 3]
        scale = context_w["scale"][:, None, :]
        s, _, r, _, c = planes.shape
        n = coords.shape[1]
        rad = self.corr_patch_radius

        grid = (coords - lo) * scale  # [S, N, 3] in plane units
        dy, dx = jnp.meshgrid(
            jnp.arange(-rad, rad + 1, dtype=jnp.float32),
            jnp.arange(-rad, rad + 1, dtype=jnp.float32),
            indexing="ij",
        )
        offsets = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)  # [P2, 2]
        p2 = offsets.shape[0]

        out = []
        for pi, axes in enumerate(((0, 1), (1, 2), (0, 2))):
            plane = planes[:, pi]  # [S, R, R, C]
            for lvl in range(self.corr_n_levels):
                if lvl > 0:
                    plane = geo.avg_pool_2x2(
                        plane.transpose(0, 3, 1, 2)
                    ).transpose(0, 2, 3, 1)
                level_scale = 0.5**lvl
                centers = grid[..., list(axes)] * level_scale  # [S, N, 2]
                pts = centers[:, :, None, :] + offsets[None, None]  # [S, N, P2, 2]
                pts = pts.reshape(s, n * p2, 2)
                sampled = geo.bilinear_sample2d(
                    plane, pts[..., 0], pts[..., 1]
                ).reshape(s, n, p2, c)
                corr = jnp.einsum("snc,snpc->snp", ffeats, sampled) / jnp.sqrt(c)
                out.append(corr)
        return jnp.concatenate(out, axis=-1)  # [S, N, 3*L*P2]
