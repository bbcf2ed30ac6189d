"""MVTracker core model (L3): sliding-window multi-view 3D point tracking.

TPU-native re-design of the reference tracker
(`mvtracker/models/core/mvtracker/mvtracker.py:93-732`). The math is the
same — CNN features per view, fused world-space feature clouds per pyramid
level, kNN + grouped correlation around each track point, and a factorized
space/time transformer predicting coordinate deltas over a sliding temporal
window — but the orchestration is rebuilt for XLA's compilation model:

- **No dynamic shapes.** The reference sorts queries by start time and grows
  an active point set window by window (`mvtracker.py:513-541`); here all N
  tracks are carried through every window with mask algebra: an `active`
  mask gates attention (virtual tokens cannot see inactive tracks), output
  writes, and the loss. Results for the active set are equivalent.
- **No rolling feature cache.** The reference recomputes CNN features per
  window with overlap reuse to bound GPU memory (`mvtracker.py:546-574`);
  on TPU we batch the encoder over ALL (view, frame) images at once — one
  big MXU-friendly conv batch — and slice windows out of precomputed
  per-level clouds.
- **Queries are never sorted.** Window chaining is expressed with
  per-point masks, so outputs stay in input order (the reference needs
  `sort_inds`/`inv_sort_inds`, `mvtracker.py:513-525`).
- Matrix inversions run in fp32 exactly like the reference
  (`mvtracker.py:288-291`); correlation/kNN geometry stays fp32 while conv
  and transformer compute can be bf16.

The model operates on a single scene (no batch axis) — batching is done
with `jax.vmap` outside, which is both simpler and what pjit/shard_map
want. Channels-last layouts throughout.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mvtracker_tpu.models.encoder import BasicEncoder
from mvtracker_tpu.models.updateformer import EfficientUpdateFormer
from mvtracker_tpu.ops import corr as corr_ops
from mvtracker_tpu.ops import knn as knn_ops
from mvtracker_tpu.utils import embeddings as emb
from mvtracker_tpu.utils import geometry as geo


def compute_scene_normalization(
    depths, extrs, intrs, max_depth: float = 24.0, stat_stride: int = 4
):
    """VGGT-style scene normalization transform (scale, R, t).

    Mirrors reference `compute_vggt_scene_normalization_transform`
    (`mvtracker.py:735-766`): unproject the first frame's depth in every
    view, express in the first camera's frame, scale = 1/mean distance;
    rotation/translation from the first camera pose. Includes the
    reference's depth clamp to >= max_depth before computing the scale
    (`mvtracker.py:466-467`).

    The statistic is computed on a `stat_stride`-subsampled pixel grid:
    the reference also derives it from strided depth, and a one-scalar
    mean does not need a V*H*W*3 full-res unprojection (round-2 review
    flagged the full-res version as wasted work on the normalized path).

    depths [V, T, H, W], extrs [V, T, 3, 4], intrs [V, T, 3, 3].
    """
    s = stat_stride
    # NOTE: this RAISES all depths below 24 to 24 — almost certainly meant
    # to CAP far outliers, but it is exactly what the reference executes
    # (`_d[_d < max_depth] = max_depth`, `mvtracker.py:466-467`) and the
    # released checkpoint was produced under it, so it is kept verbatim for
    # numerical parity. Scale still varies with camera geometry.
    d0_raw = depths[:, 0, ::s, ::s]
    d0 = jnp.maximum(d0_raw, max_depth)  # reference's (quirky) clamp
    world = geo.unproject_depth_to_world(
        d0,
        geo.invert_intrinsics(intrs[:, 0]),
        geo.invert_extrinsics(extrs[:, 0]),
        stride=s,
    )  # [V, H/s, W/s, 3]
    pts = world.reshape(-1, 3)
    e0 = extrs[0, 0]  # [3, 4] world->cam of first camera
    pts_h = geo.to_homogeneous(pts)
    in_first = jnp.einsum("ij,nj->ni", e0, pts_h)
    valid = (d0_raw > 0).reshape(-1)
    dist = jnp.linalg.norm(in_first, axis=-1)
    avg = jnp.sum(dist * valid) / jnp.maximum(jnp.sum(valid), 1.0)
    scale = 1.0 / avg
    rot = e0[:, :3]
    trans = e0[:, 3] * scale
    return scale, rot, trans


def apply_scene_transform(scale, rot, trans, xyz):
    """x' = t + R @ (s * x) for [..., 3] points (jnp)."""
    return jnp.einsum("ij,...j->...i", rot, xyz * scale) + trans


def invert_scene_transform(scale, rot, trans, xyz):
    """Inverse of `apply_scene_transform`."""
    return jnp.einsum("ji,...j->...i", rot, xyz - trans) / scale


def consume_stats(intermediates: dict):
    """Aggregate sowed kNN neighbor-distance stats into a pandas table.

    Mirrors the reference's `MVTracker.consume_stats`
    (`mvtracker/mvtracker.py:190-242`), which collects per-level /
    per-iteration kNN neighbor distances into pandas DataFrames for eval
    diagnostics. Input is the "intermediates" collection returned by
    `model.apply(..., mutable=["intermediates"])` on a model constructed
    with `collect_stats=True`; each `knn_dists_lvl{L}` leaf is stacked by
    the window/iteration scans to [n_windows, iters, k].

    Returns a long-format DataFrame with columns
    (window, iteration, level, k, mean_dist).
    """
    import pandas as pd

    rows = []
    for name, vals in intermediates.items():
        if not name.startswith("knn_dists_lvl"):
            continue
        lvl = int(name[len("knn_dists_lvl"):])
        arr = np.asarray(vals[0] if isinstance(vals, (tuple, list)) else vals)
        arr = arr.reshape(arr.shape[0], arr.shape[1], -1)  # [W, iters, K]
        for wi in range(arr.shape[0]):
            for ii in range(arr.shape[1]):
                for kk in range(arr.shape[2]):
                    rows.append(
                        {
                            "window": wi,
                            "iteration": ii,
                            "level": lvl,
                            "k": kk,
                            "mean_dist": float(arr[wi, ii, kk]),
                        }
                    )
    df = pd.DataFrame(rows)
    if len(df):
        df = df.sort_values(["level", "window", "iteration", "k"]).reset_index(drop=True)
    return df


def window_starts(num_frames: int, window_len: int) -> list[int]:
    """Static sliding-window start frames; mirrors the reference loop
    condition `while w_idx_start < num_frames - S // 2` with hop S/2
    (`mvtracker/mvtracker.py:537,696`), anchored at frame 0.

    At runtime the anchor is `min(query_t)` like the reference
    (`mvtracker.py:531`); these frame-0 starts are the static worst case
    (the anchor is added as a traced offset, and windows past the dynamic
    count are masked out of outputs and loss via `window_valid`)."""
    hop = window_len // 2
    return list(range(0, max(num_frames - hop, 1), hop))


class MVTracker(nn.Module):
    """Multi-view 3D point tracker.

    Hyperparameters mirror the reference defaults
    (`mvtracker/mvtracker.py:94-128`).
    """

    sliding_window_len: int = 12
    stride: int = 4
    fmaps_dim: int = 128
    add_space_attn: bool = True
    num_heads: int = 6
    hidden_size: int = 384
    space_depth: int = 6
    time_depth: int = 6
    num_virtual_tracks: int = 64
    corr_n_groups: int = 1
    corr_n_levels: int = 4
    corr_neighbors: int = 16
    # Optional per-level neighbor counts, fine -> coarse (None = uniform
    # `corr_neighbors`). Round-3 found that level-0 correlation coverage
    # shrinks with resolution (cell ~0.06 world units/px at res 128): the
    # k nearest neighbors of a dense fine cloud span a smaller world
    # radius than one frame of typical motion (0.2-0.4 units), so the
    # finest level carries no gradient toward the target until the coarse
    # levels have pulled the estimate close. Widening k ONLY at the fine
    # level(s) restores coverage where it is lost without paying k x cost
    # at every level (kNN extraction cost is linear in k). Changes the
    # update-transformer input width; `Trainer.warm_start` migrates
    # checkpoints trained at uniform k by zero-initializing the new
    # neighbor rows of the input projection (extra neighbors start
    # ignored and are learned into use).
    corr_neighbors_per_level: Optional[tuple] = None
    corr_add_neighbor_offset: bool = True
    corr_add_neighbor_xyz: bool = False
    # Global-match initialization of non-chained window coords: instead of
    # broadcasting the query position to every frame of a window (the
    # reference init, `mvtracker.py:528-529` — whose correlation features
    # go blind as soon as true motion exceeds the kNN neighborhood's
    # world-space radius), each track's init feature is soft-matched
    # against a coarse pyramid level's fused cloud per frame:
    #     init[s, n] = sum_p softmax_p(<feat_init[n], fvec[s, p]> * temp
    #                  / sqrt(C)) * xyz[s, p]
    # — a whole-scene capture range for one small einsum (T*N*P_coarse*C
    # MACs), the coarse-to-fine window init NOTES proposed for the
    # capture-range failure. State-only (stop-gradient, like chaining);
    # chained frames keep their chained init. Enable once features are
    # meaningful (fine-tune phases / eval) — at random init the softmax is
    # near-uniform and the init degrades to the cloud centroid.
    global_match_init: bool = False
    global_match_level: int = 1
    global_match_temp: float = 10.0
    # Constant-velocity extrapolation of the chained window init: the
    # frames a new window adds beyond the previous window's overlap are
    # initialized at tail + v * chain_velocity * steps (v = the previous
    # window's last inter-frame displacement) instead of the reference's
    # static copy of the last position (`mvtracker.py:647-655`). 0.0 =
    # reference behavior. Round-3 diagnosis: per-frame motion of 0.2-0.4
    # world units starts outside the fine correlation level's coverage;
    # a first-order init keeps moving tracks inside the basin where the
    # fine level still has gradient. Inference-time only state-chaining —
    # no parameters change, so any checkpoint can toggle it.
    chain_velocity: float = 0.0
    # Fast mode: compute the correlation kNN ONCE per window (at the
    # window's initial coords — chained from the previous window's tail)
    # and reuse the neighbor set across all refinement iterations; offsets
    # and correlations still update with the refined coords each iteration.
    # Cuts kNN cost by the iteration count (~4x). APPROXIMATE: the
    # reference re-searches every iteration (`mvtracker.py:815`).
    # Measured on a trained tracking model (scripts/
    # verify_knn_reuse_quality.py + profile_knn_reuse.py, v5e): 1.39x
    # forward speedup (93.1 -> 66.8 ms flagship) at metric-neutral
    # quality (AJ 40.80 -> 40.47, ATE 31.96 -> 32.13, trajectory
    # divergence p95 0.096 scene units vs xyz std 0.5). Default stays
    # False so training and converted-checkpoint inference match the
    # reference numerics exactly; flip on for serving/long-video
    # throughput (configs/mvtracker_longvideo.yaml does).
    corr_knn_reuse: bool = False
    # Exclude zero-depth pixels (which unproject to the camera origin) from
    # the kNN reference set during correlation (reference
    # `corr_filter_invalid_depth`, `mvtracker.py:112,815-826`; off by
    # default there too). The reference compacts the cloud per batch and
    # then gathers neighbor xyz/fvec from the UNcompacted arrays with the
    # compacted indices — an index-misalignment bug whenever invalid points
    # are not a suffix; here invalid points get sentinel coordinates (1e9)
    # instead, so indices stay aligned and shapes stay static. If a frame
    # has fewer than k valid points, sentinel picks fall back to that
    # query's nearest valid neighbor.
    corr_filter_invalid_depth: bool = False
    flow_embed_dim: int = 64
    # Visibility-head upgrades (both default OFF = reference parity: a
    # single Linear on the track features, `mvtracker.py:408`).
    #
    # vis_geom_features feeds the head direct geometric occlusion evidence:
    # the final coords are projected into every view and z-tested against
    # the (strided) depth maps — tanh((depth - z)/tau) clearance scores at
    # several tolerances tau, aggregated over views (max + mean + valid
    # fraction). This is the same per-view z-test that DEFINES ground-truth
    # visibility in the data factories, so the head gets the signal it is
    # asked to predict instead of having to recover it from correlation
    # residue in the track features. TPU-cheap: V bilinear gathers per
    # (frame, track). Gradients are stopped at the coords (visibility loss
    # must not tug localization).
    vis_geom_features: bool = False
    vis_geom_taus: tuple = (0.05, 0.2, 1.0)
    # Hidden width of the visibility head MLP (0 = reference's single
    # Linear; >0 inserts one GELU hidden layer).
    vis_head_hidden: int = 0
    knn_backend: str = "auto"
    # Distributed kNN over a device-sharded fused cloud (SURVEY §2.6:
    # "shard V·H·W (fused cloud) for kNN"). When a mesh is given, pyramid
    # levels with at least `knn_shard_min_points` points run their
    # correlation kNN inside a shard_map over `knn_shard_axis`: the cloud
    # is split across the axis, each device searches its shard, and the
    # per-shard candidates merge by the schedule the round-2 crossover
    # measurement picked (ops/knn.py: ring iff M*k > N/D, else
    # gather-merge). Results are bitwise identical to the global search
    # (same distances, global indices). None = replicated cloud, XLA
    # partitioner decides (the default single-chip path).
    knn_mesh: Optional[Any] = None
    knn_shard_axis: str = "model"
    knn_shard_min_points: int = 2048
    # Correlation kernel dispatch ("auto" = fused Pallas on TPU, gather+
    # einsum elsewhere; "pallas_interpret" runs the TPU kernel under the
    # Pallas interpreter so CPU-mesh tests cover the SPMD-partitioner x
    # pallas_call interaction of the sharded step).
    corr_backend: str = "auto"
    # Unroll factor of the update transformer's scanned layer stack.
    # Measured on v5e at the flagship bench shapes (cold compile / step):
    # unroll=1 17s/94.9ms, 2 18s/92.9ms, 3 20s/93.5ms, 6 31s/93.1ms —
    # versus ~5-6 MINUTES cold compile for the pre-scan unrolled loop at
    # the same ~93 ms step. 2 is the sweet spot.
    transformer_scan_unroll: int = 2
    # LoFTR support-feature memory in the update transformer (reference
    # SpaTracker "gnn"; 0 disables — MVTracker proper has none, the
    # triplane SpaTracker variant defaults to the reference's 100).
    support_memory_tokens: int = 0
    compute_dtype: str = "float32"  # "bfloat16" runs conv/attention on bf16 MXU paths
    # Optional PTv3-equivalent cloud backbone (reference `use_ptv3`,
    # `evaluator_3dpt.py:245`): serialized point transformer refining the
    # level-0 fused cloud features before correlation.
    use_point_transformer: bool = False
    point_transformer_depth: int = 2
    normalize_scene_in_fwd_pass: bool = False  # VGGT-style (`mvtracker.py:463-481`)
    # Rematerialize encoder/transformer activations in the backward pass
    # (jax.checkpoint): trades ~30% extra FLOPs for a large activation-memory
    # reduction — the TPU answer to the reference's rolling-cache memory
    # management (`mvtracker.py:546-574`). Enable for long videos / large
    # batch training.
    remat: bool = False
    # Keep the ENCODER out of remat while remat=True: the fmaps are
    # computed once for the whole video and are small relative to the
    # per-iteration transformer activations ([V, T, H/4, W/4, C] bf16 =
    # ~100 MB at the 4x24x256^2 flagship shapes), but rematerializing
    # them re-runs the full conv stack inside the backward. Measured in
    # round 5 (scripts/profile_train_step.py): encoder backward+recompute
    # = 134 ms of a 440 ms flagship train step vs a 22 ms forward.
    remat_encoder: bool = True
    # Model-internal kNN neighbor-distance statistics (reference
    # `init_stats`/`consume_stats`, `mvtracker.py:190-242`): when True, mean
    # neighbor distances per (window, iteration, level, k-rank) are sowed
    # into the "intermediates" collection; run `.apply(...,
    # mutable=["intermediates"])` and feed the result to `consume_stats`.
    collect_stats: bool = False

    def corr_k(self, lvl: int) -> int:
        """Neighbor count at pyramid level `lvl` (fine = 0)."""
        if self.corr_neighbors_per_level is not None:
            return int(self.corr_neighbors_per_level[lvl])
        return self.corr_neighbors

    @property
    def corr_feat_width(self) -> int:
        """Per-neighbor correlation feature width."""
        return (
            self.corr_n_groups
            + 3 * int(self.corr_add_neighbor_offset)
            + 3 * int(self.corr_add_neighbor_xyz)
        )

    @property
    def updateformer_input_dim(self) -> int:
        """Input feature dim; mirrors reference `mvtracker.py:130-149`."""
        return (
            (self.flow_embed_dim + 1) * 3
            + sum(self.corr_k(l) for l in range(self.corr_n_levels))
            * self.corr_feat_width
            + self.fmaps_dim
            + 1
            + 1
        )

    def setup(self):
        dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        enc_cls = (
            nn.remat(BasicEncoder)
            if (self.remat and self.remat_encoder)
            else BasicEncoder
        )
        uf_cls = nn.remat(EfficientUpdateFormer) if self.remat else EfficientUpdateFormer
        self.fnet = enc_cls(output_dim=self.fmaps_dim, stride=self.stride, dtype=dtype)
        self.updateformer = uf_cls(
            space_depth=self.space_depth,
            time_depth=self.time_depth,
            input_dim=self.updateformer_input_dim,
            hidden_size=self.hidden_size,
            num_heads=self.num_heads,
            output_dim=3 + self.fmaps_dim,
            mlp_ratio=4.0,
            add_space_attn=self.add_space_attn,
            num_virtual_tracks=self.num_virtual_tracks,
            dtype=dtype,
            scan_unroll=self.transformer_scan_unroll,
            support_memory_tokens=self.support_memory_tokens,
        )
        # Feature update head (reference `mvtracker.py:178-180`): GroupNorm(1,C)
        # == LayerNorm with affine at eps 1e-5, then Linear+GELU.
        self.ffeats_norm = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False)
        self.ffeats_updater = nn.Dense(self.fmaps_dim)
        if self.vis_head_hidden > 0:
            self.vis_hidden = nn.Dense(self.vis_head_hidden)
        self.vis_predictor = nn.Dense(1)
        if self.use_point_transformer:
            from mvtracker_tpu.models.point_transformer import SerializedPointTransformer

            self.cloud_backbone = SerializedPointTransformer(
                dim=self.fmaps_dim,
                depth=self.point_transformer_depth,
                dtype=dtype,
            )

    # ------------------------------------------------------------------
    # Sub-computations
    # ------------------------------------------------------------------

    def compute_fmaps(self, rgbs: jax.Array) -> jax.Array:
        """Encode all frames of all views at once.

        rgbs: [V, T, H, W, 3] in [0, 255]. Returns [V, T, H/s, W/s, C].
        (Reference computes this per window with a rolling cache,
        `mvtracker.py:546-574`; here it is one batched conv stack.)
        """
        v, t, h, w, _ = rgbs.shape
        x = 2.0 * (rgbs.reshape(v * t, h, w, 3) / 255.0) - 1.0
        fmaps = self.fnet(x)
        return fmaps.reshape(v, t, h // self.stride, w // self.stride, self.fmaps_dim)

    def _build_context(self, fmaps, depths_strided, intrs, extrs):
        """Correlation context for the full video — variant hook.

        MVTracker: per-level fused world-space clouds; a pytree whose leaves
        all have a leading T (frame) axis, so the window scan can gather
        frames uniformly. Returns list over levels of
        (xyz [T, P_l, 3], fvec [T, P_l, C]).
        """
        clouds = []
        for lvl in range(self.corr_n_levels):
            out = geo.init_pointcloud_from_rgbd(
                fmaps[None],  # [1, V, T, h, w, C]
                depths_strided[None],
                intrs[None],
                extrs[None],
                stride=self.stride,
                level=lvl,
                return_validity_mask=self.corr_filter_invalid_depth,
            )
            xyz, fvec = out[0], out[1]
            valid = out[2] if self.corr_filter_invalid_depth else None
            if lvl == 0 and self.use_point_transformer:
                # Per-frame serialized-attention refinement of the fused
                # cloud (PTv3-equivalent backbone).
                fvec = jax.vmap(self.cloud_backbone)(xyz, fvec)
            if self.compute_dtype == "bfloat16":
                # Cloud features stream through the correlation kernel in
                # bf16 anyway (reference computes correlation under bf16
                # autocast); storing them bf16 halves the per-window gather
                # traffic and avoids re-casting inside the refine scan.
                # Geometry (xyz) stays fp32.
                fvec = fvec.astype(jnp.bfloat16)
            # valid=None stays a pytree-empty slot (the window scan's
            # tree.map gathers only array leaves).
            clouds.append((xyz, fvec, valid))  # [T,P_l,3], [T,P_l,C], [T,P_l]?
        return clouds

    def _feat_init(self, context, query_t, query_xyz):
        """Per-query feature init: k=1 NN lookup into the level-0 cloud of
        each query's start frame (reference `mvtracker.py:606-645`).

        query_t: [N] int; query_xyz: [N, 3]. Returns [N, C].
        """
        cloud0_xyz, cloud0_fvec = context[0][0], context[0][1]
        t = cloud0_xyz.shape[0]
        n = query_xyz.shape[0]
        # kNN of every query against every frame's cloud (batch = frames),
        # then select each query's own start frame. T*N*P distance work is
        # one batched MXU matmul — cheaper than dynamic per-frame grouping.
        queries = jnp.broadcast_to(query_xyz[None], (t, n, 3))
        _, idx = knn_ops.knn(cloud0_xyz, queries, 1, backend=self.knn_backend)
        fvec = corr_ops.gather_neighbors(cloud0_fvec, idx)[:, :, 0]  # [T, N, C]
        # mode="clip": a query_t at/beyond T (video truncated below a
        # query's start) must not inject take_along_axis's NaN fill — one
        # NaN row would spread to every track through attention.
        return jnp.take_along_axis(
            fvec, query_t[None, :, None], axis=0, mode="clip"
        )[0]  # [N, C]

    def _vis_geom_features(self, geom_w, coords):
        """Per-view depth z-test features for the visibility head.

        geom_w: (depths [V, S, H, W] FULL-RES depth, intrs [V, S, 3, 3],
        extrs [V, S, 3, 4]).
        coords: [S, N, 3] world points (already stop-gradiented).

        For every view: project, bilinearly sample the full-res depth, and
        score the signed clearance c = depth - camera_z with tanh(c / tau)
        per tolerance tau (c >= 0: point on or in front of the rendered
        surface -> visible there; c < 0: behind -> occluded). Aggregated
        over views (masked max + masked mean per tau, plus the valid-view
        fraction) so the feature width is view-count-independent. This
        mirrors the z-test that defines GT visibility in the data factories
        (e.g. the Kubric loader's depth z-test and the synthetic renderer);
        the reference's vis head has no such direct evidence. Full-res (not
        stride-subsampled) depth matters: measured on a synthetic scene with
        GT coords, the best-view clearance alone labels 91.4% of
        (frame, track) visibilities correctly at full res vs 87.5% strided
        (always-visible baseline: 64%). Cost is V bilinear gathers per
        (frame, track) from a map already resident in HBM.
        Returns [S, N, 2 * len(taus) + 1].
        """
        depths_f, intrs, extrs = geom_w
        v, s, h, w = depths_f.shape
        n = coords.shape[1]
        coords_v = jnp.broadcast_to(coords[None], (v, s, n, 3))
        pix, z = geo.world_to_pixel_xy_and_camera_z(
            coords_v, intrs, extrs
        )  # [V, S, N, 2], [V, S, N, 1]
        z = z[..., 0]
        d = geo.bilinear_sample2d(
            depths_f.reshape(v * s, h, w, 1),
            pix[..., 0].reshape(v * s, n),
            pix[..., 1].reshape(v * s, n),
        ).reshape(v, s, n)
        inb = (
            (pix[..., 0] >= 0)
            & (pix[..., 0] <= w - 1)
            & (pix[..., 1] >= 0)
            & (pix[..., 1] <= h - 1)
            & (z > 1e-3)
        )
        valid = inb & (d > 0)  # depth==0 pixels carry no surface evidence
        clearance = d - z  # [V, S, N]
        feats = []
        for tau in self.vis_geom_taus:
            sc = jnp.tanh(clearance / tau)
            sc_masked = jnp.where(valid, sc, -1.0)
            feats.append(sc_masked.max(axis=0))  # best-view evidence
            cnt = jnp.maximum(valid.sum(axis=0), 1)
            feats.append(jnp.where(valid, sc, 0.0).sum(axis=0) / cnt)
        feats.append(valid.mean(axis=0).astype(jnp.float32) * 2.0 - 1.0)
        return jnp.stack(feats, axis=-1)  # [S, N, 2*len(taus)+1]

    def _vis_logits(self, ffeats, geom_w, coords):
        """Visibility head: reference single Linear on track features
        (`mvtracker.py:408`), optionally widened with geometric z-test
        evidence and/or one hidden layer (vis_geom_features /
        vis_head_hidden, both off by default)."""
        x = ffeats
        if self.vis_geom_features and geom_w is not None:
            gfeats = self._vis_geom_features(geom_w, jax.lax.stop_gradient(coords))
            x = jnp.concatenate([x, gfeats.astype(x.dtype)], axis=-1)
        if self.vis_head_hidden > 0:
            x = nn.gelu(self.vis_hidden(x), approximate=False)
        return self.vis_predictor(x)[..., 0]  # [S, N]

    def forward_iteration(
        self,
        context_w,  # windowed correlation context (variant-specific pytree)
        coords_init,  # [S, N, 3]
        vis_init,  # [S, N]
        track_mask,  # [S, N] float (the transformer input feature)
        active,  # [N] bool — tracks visible to the virtual tokens
        feat_init,  # [N, C]
        iters: int,
        geom_w=None,  # optional (depths_s, intrs, extrs) for vis_geom_features
    ):
        """Iterative refinement within one window.

        Mirrors reference `forward_iteration` (`mvtracker.py:244-410`) with
        the active set expressed as an attention mask.
        """
        s, n, _ = coords_init.shape
        c = self.fmaps_dim
        d_in = self.updateformer_input_dim

        # Positional embedding of the initial coords (first frame), rounded
        # up to a multiple of 6 then truncated (reference `mvtracker.py:324-331`).
        embed_dim = d_in if d_in % 6 == 0 else d_in + 6 - d_in % 6
        pos_embed = emb.sincos_3d(embed_dim, coords_init[0])[:, :d_in]  # [N, d_in]

        # Time embedding over normalized window time (reference `mvtracker.py:333-344`).
        t_dim = d_in if d_in % 2 == 0 else d_in + 1
        times = jnp.arange(s, dtype=jnp.float32) / s
        times_embed = emb.sincos_1d(t_dim, times)[:, :d_in]  # [S, d_in]

        coords0 = coords_init
        # fp32 carry regardless of the cloud-feature storage dtype (the
        # scan carry dtype must be stable across iterations).
        ffeats0 = jnp.broadcast_to(feat_init[None], (s, n, c)).astype(jnp.float32)
        mask_and_vis = jnp.stack([track_mask, vis_init], axis=-1)  # [S, N, 2]

        # Fast mode: one kNN per window at the initial coords (identical to
        # the first iteration's search), reused across all iterations.
        knn_cache = None
        if self.corr_knn_reuse:
            knn_cache = self._corr_knn(context_w, jax.lax.stop_gradient(coords_init))

        def refine_step(mdl, carry, _):
            coords, ffeats = carry
            coords = jax.lax.stop_gradient(coords)

            fcorrs = mdl._corr_features(
                context_w, coords, ffeats, knn_cache=knn_cache
            )  # [S, N, LRR]

            flows = coords - coords[0:1]  # [S, N, 3]
            flows_emb = emb.coord_embedding_3d(flows, self.flow_embed_dim)  # [S,N,195]

            x = jnp.concatenate([flows_emb, fcorrs, ffeats, mask_and_vis], axis=-1)
            x = x + pos_embed[None] + times_embed[:, None]
            x = x.transpose(1, 0, 2)[None]  # [1, N, S, D]

            delta = mdl.updateformer(x, track_mask=active[None])[0]  # [N, S, 3+C]
            delta = delta.transpose(1, 0, 2)  # [S, N, 3+C]

            d_coord = delta[..., :3]
            # Reference order (`mvtracker.py:179,394-396`): GroupNorm(1,C)
            # -> Linear -> GELU.
            d_feats = nn.gelu(
                mdl.ffeats_updater(mdl.ffeats_norm(delta[..., 3:])), approximate=False
            )
            coords = coords + d_coord
            ffeats = ffeats + d_feats
            return (coords, ffeats), coords

        # Scan over refinement iterations: graph size independent of `iters`
        # (the reference unrolls, `mvtracker.py:350-406`; numerics identical).
        scanned = nn.scan(
            refine_step,
            variable_broadcast="params",
            variable_axes={"intermediates": 0},
            split_rngs={"params": False},
            length=iters,
            out_axes=0,
        )
        (coords, ffeats), coords_stack = scanned(self, (coords0, ffeats0), None)
        coord_predictions = [coords_stack[i] for i in range(iters)]

        vis_logits = self._vis_logits(ffeats, geom_w, coords)  # [S, N]
        return coord_predictions, vis_logits

    def _corr_features(self, context_w, coords, ffeats, knn_cache=None):
        """Correlation features per (frame, track) — variant hook.

        MVTracker: kNN into each pyramid level's fused cloud + grouped
        correlation (reference `PointcloudCorrBlock.corr_sample`,
        `mvtracker.py:800-846`). Returns [S, N, LRR]. `knn_cache`, when
        given, supplies precomputed (dists, idx) per level (corr_knn_reuse).
        """
        s, n, _ = coords.shape
        levels = list(range(self.corr_n_levels))
        if knn_cache is not None:
            knn_dists, knn_idx = knn_cache
        else:
            knn_dists, knn_idx = self._corr_knn(context_w, coords)

        fcorrs = []
        for lvl in levels:
            xyz_l, fvec_l = context_w[lvl][0], context_w[lvl][1]
            dists, idx = knn_dists[lvl], knn_idx[lvl]
            p_l = xyz_l.shape[1]
            if self.corr_k(lvl) > p_l:
                # Coarse pyramid levels of small inputs can hold fewer
                # points than corr_neighbors (e.g. 2 views at 64x64 ->
                # 8-point level-3 cloud): neighbor ranks >= p_l are padding
                # sentinels whose 1e9 coordinates would enter the offset
                # features and blow up the transformer. Wrap the ranks so
                # real neighbors repeat instead (static shapes preserved).
                wrap = np.arange(self.corr_k(lvl)) % p_l
                dists = dists[..., wrap]
                idx = idx[..., wrap]
            if self.collect_stats:
                # Mean neighbor distance per k-rank, aggregated over the
                # window's (frame, track) grid (reference `mvtracker.py:
                # 190-242` collects the same distances into pandas tables).
                self.sow("intermediates", f"knn_dists_lvl{lvl}", dists.mean(axis=(0, 1)))
            fc = corr_ops.corr_sample(
                xyz_l,
                fvec_l,
                ffeats,
                coords,
                idx,
                groups=self.corr_n_groups,
                add_neighbor_offset=self.corr_add_neighbor_offset,
                add_neighbor_xyz=self.corr_add_neighbor_xyz,
                backend=self.corr_backend,
                # bf16 stream matches the reference's bf16-autocast corr.
                compute_dtype=jnp.bfloat16 if self.compute_dtype == "bfloat16" else None,
            )  # [S, N, K, F]
            fcorrs.append(fc.reshape(s, n, -1))
        return jnp.concatenate(fcorrs, axis=-1)

    def _knn_sharded_call(self, ref, coords, k):
        """Level kNN through the distributed schedules inside a shard_map.

        ref [S, P, 3] (P split over the mesh axis), coords [S, N, 3]
        replicated. Schedule choice follows the measured crossover
        (scripts/profile_sharded_knn.py, NOTES "ring wins iff M*k > N/D"):
        the ring rotates cloud shards over neighbor links; the gather-merge
        all-gathers each shard's k candidates. Both return (dists, GLOBAL
        indices) replicated on every device — bitwise equal to the global
        search, asserted by tests/test_pallas_sharded.py and the driver's
        dryrun_multichip.
        """
        import inspect

        try:
            from jax import shard_map  # jax >= 0.7 public API
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as PSpec

        # Replication checking must be OFF: the ring schedule's outputs are
        # replicated by construction (every device folds every shard), which
        # the varying-manual-axes checker cannot prove. The kwarg was
        # renamed check_rep -> check_vma across jax versions.
        sig = inspect.signature(shard_map).parameters
        check_kw = (
            {"check_vma": False}
            if "check_vma" in sig
            else {"check_rep": False} if "check_rep" in sig else {}
        )

        mesh = self.knn_mesh
        axis = self.knn_shard_axis
        d = mesh.shape[axis]
        p = ref.shape[1]
        pad = (-p) % d
        if pad:
            # Sentinel padding can never enter a top-k (every level holds
            # >= k real points).
            ref = jnp.pad(ref, ((0, 0), (0, pad), (0, 0)), constant_values=1e9)
        m = coords.shape[1]
        use_ring = m * k > (p + pad) // d
        dist_fn = knn_ops.knn_sharded_ring if use_ring else knn_ops.knn_sharded
        fn = shard_map(
            lambda r, q: dist_fn(r, q, k, axis_name=axis, backend=self.knn_backend),
            mesh=mesh,
            in_specs=(PSpec(None, axis, None), PSpec(None, None, None)),
            out_specs=(PSpec(None, None, None), PSpec(None, None, None)),
            **check_kw,
        )
        dists, idx = fn(ref, coords)
        if pad:
            idx = jnp.minimum(idx, p - 1)
        return dists, idx

    def _corr_knn(self, context_w, coords):
        """kNN of track coords into every pyramid level's fused cloud.

        Returns ({lvl: dists [S,N,K]}, {lvl: idx [S,N,K]}).
        """
        s = coords.shape[0]
        levels = list(range(self.corr_n_levels))

        def knn_ref(lvl):
            """kNN reference set: cloud xyz, with invalid-depth points moved
            to a 1e9 sentinel when corr_filter_invalid_depth is on (they can
            never enter a top-k; indices stay aligned with the cloud)."""
            xyz_l, valid_l = context_w[lvl][0], context_w[lvl][2]
            if valid_l is None:
                return xyz_l
            return jnp.where(valid_l[..., None], xyz_l, 1e9)

        # Distributed path: levels big enough to be worth sharding run the
        # gather-merge / ring schedules over the mesh axis.
        use_shard = (
            self.knn_mesh is not None
            and self.knn_mesh.shape.get(self.knn_shard_axis, 1) > 1
        )

        # kNN per pyramid level. Small levels (coarse clouds) are
        # launch-overhead-bound as individual kernel calls (~0.4 ms each on
        # v5e regardless of work), so levels with <= 1024 points are padded
        # to a common size and batched into ONE call; padding points sit at
        # 1e9 and can never enter a top-k (every level has >= k real
        # points). Results are bitwise identical to per-level calls. With
        # per-level neighbor counts the batched call searches the max k of
        # the small levels and each level keeps its ascending-sorted
        # prefix — still identical to a per-level call at that level's k.
        small = [l for l in levels if context_w[l][0].shape[1] <= 1024]
        knn_idx: dict[int, jax.Array] = {}
        knn_dists: dict[int, jax.Array] = {}
        for lvl in levels:
            if lvl in small and len(small) > 1:
                continue
            ref_l = knn_ref(lvl)
            if use_shard and ref_l.shape[1] >= self.knn_shard_min_points:
                d, i = self._knn_sharded_call(ref_l, coords, self.corr_k(lvl))
            else:
                d, i = knn_ops.knn(
                    ref_l, coords, self.corr_k(lvl), backend=self.knn_backend
                )
            knn_dists[lvl], knn_idx[lvl] = d, i
        if len(small) > 1:
            pmax = max(context_w[l][0].shape[1] for l in small)
            kmax = max(self.corr_k(l) for l in small)
            refs = jnp.concatenate(
                [
                    jnp.pad(
                        knn_ref(l),
                        ((0, 0), (0, pmax - context_w[l][0].shape[1]), (0, 0)),
                        constant_values=1e9,
                    )
                    for l in small
                ],
                axis=0,
            )  # [len(small)*S, pmax, 3]
            qs = jnp.concatenate([coords] * len(small), axis=0)
            d_all, i_all = knn_ops.knn(
                refs, qs, kmax, backend=self.knn_backend
            )
            for j, l in enumerate(small):
                knn_dists[l] = d_all[j * s : (j + 1) * s, :, : self.corr_k(l)]
                knn_idx[l] = i_all[j * s : (j + 1) * s, :, : self.corr_k(l)]
        if self.corr_filter_invalid_depth:
            # Frames with fewer than k valid points let sentinels through;
            # fall back to that query's nearest (rank-0) valid neighbor so
            # offsets/correlation never see 1e9 coordinates. A frame with
            # ZERO valid points leaves even rank-0 bad — and in the batched
            # small-level path its index can point into the inter-level
            # padding (>= P_l), which take_along_axis would fill with NaN —
            # so indices are additionally clamped into the level's range
            # (features there are meaningless but finite, like the
            # reference's untracked placeholder rows).
            for lvl in levels:
                d, i = knn_dists[lvl], knn_idx[lvl]
                bad = d > 1e8
                i = jnp.where(bad, i[..., :1], i)
                knn_idx[lvl] = jnp.minimum(i, context_w[lvl][0].shape[1] - 1)
                knn_dists[lvl] = jnp.where(bad, d[..., :1], d)
        return knn_dists, knn_idx

    # ------------------------------------------------------------------
    # Full forward
    # ------------------------------------------------------------------

    def __call__(
        self,
        rgbs: jax.Array,  # [V, T, H, W, 3], 0..255
        depths: jax.Array,  # [V, T, H, W]
        query_points: jax.Array,  # [N, 4] (t, x, y, z) world-space
        intrs: jax.Array,  # [V, T, 3, 3]
        extrs: jax.Array,  # [V, T, 3, 4]
        iters: int = 4,
        is_train: bool = False,
    ) -> dict[str, Any]:
        v, t, h, w, _ = rgbs.shape
        n = query_points.shape[0]
        s = self.sliding_window_len
        hop = s // 2

        query_t = query_points[:, 0].astype(jnp.int32)  # [N]
        query_xyz = query_points[:, 1:]  # [N, 3]

        norm_transform = None
        if self.normalize_scene_in_fwd_pass:
            # Reference `mvtracker.py:463-481`: rigidly center the first
            # camera and rescale the scene before tracking; un-normalize
            # the outputs at the end.
            scale, rot, trans = compute_scene_normalization(depths, extrs, intrs)
            norm_transform = (scale, rot, trans)
            depths = depths * scale
            # E' = [R_e @ R^T, (t_e * s - R_e @ R^T @ t)] so that
            # E' @ T(x) == E @ x with T(x) = t + R (s x).
            r_new = jnp.einsum("vtij,kj->vtik", extrs[:, :, :, :3], rot)
            t_new = extrs[:, :, :, 3] * scale - jnp.einsum(
                "vtij,j->vti", r_new, trans
            )
            extrs = jnp.concatenate([r_new, t_new[..., None]], axis=-1)
            query_xyz = apply_scene_transform(scale, rot, trans, query_xyz)

        fmaps = self.compute_fmaps(rgbs)  # [V, T, h, w, C]
        depths_strided = depths[:, :, :: self.stride, :: self.stride]  # [V, T, h, w]

        context = self._build_context(fmaps, depths_strided, intrs, extrs)
        feat_init = self._feat_init(context, query_t, query_xyz)

        # Window anchor: the earliest query time, like the reference
        # (`mvtracker.py:531` `w_idx_start = query_points_t_.min()`). The
        # anchor is a traced scalar; the window COUNT stays static at the
        # frame-0 worst case, and windows the reference would not execute
        # (start >= T - hop, given the anchor) are masked out of outputs
        # and loss via `n_exec` / `window_valid`.
        qt_min = jnp.min(query_t)
        starts = window_starts(t, s)
        n_wind = len(starts)
        starts_dyn = qt_min + jnp.asarray(starts, jnp.int32)  # [W]
        # Number of windows the reference's `while w < T - hop` loop runs.
        n_exec = jnp.clip((t - hop - qt_min + hop - 1) // hop, 1, n_wind)

        def window_step(mdl, carry, const, w_start):
            """One sliding window; scanned with shared params.

            carry: (coords_last [S,N,3], vis_last [S,N]) from previous window.
            """
            coords_last, vis_last = carry
            context_c, geom_c, feat_init_c, query_t_c, query_xyz_c, qt_min_c = const

            frame_idx = jnp.minimum(w_start + jnp.arange(s), t - 1)  # [S]
            is_first = w_start == qt_min_c

            # Active set (reference p_idx_end: `mvtracker.py:538-541`) and
            # chained set: points processed in a previous window, i.e. active
            # there — query_t < prev_start + S = w_start + (S - hop)
            # (reference p_idx_start = previous window's p_idx_end,
            # `mvtracker.py:648,698`). Empty in the first window.
            active = query_t_c < w_start + s  # [N]
            chained = (query_t_c < w_start + (s - hop)) & jnp.logical_not(is_first)

            context_w = jax.tree.map(
                lambda a: jnp.take(a, frame_idx, axis=0), context_c
            )
            geom_w = (
                jax.tree.map(lambda a: jnp.take(a, frame_idx, axis=1), geom_c)
                if geom_c is not None
                else None
            )

            # coords/vis init with window chaining (`mvtracker.py:647-655`).
            if self.global_match_init:
                lvl_m = min(self.global_match_level, self.corr_n_levels - 1)
                xyz_m = jax.lax.stop_gradient(context_w[lvl_m][0])  # [S, P, 3]
                fvec_m = jax.lax.stop_gradient(context_w[lvl_m][1])  # [S, P, C]
                f_init = jax.lax.stop_gradient(feat_init_c)  # [N, C]
                c_dim = f_init.shape[-1]
                corr_m = jnp.einsum(
                    "nc,spc->snp",
                    f_init.astype(jnp.float32),
                    fvec_m.astype(jnp.float32),
                ) / jnp.sqrt(float(c_dim))
                w_m = jax.nn.softmax(corr_m * self.global_match_temp, axis=-1)
                match_xyz = jnp.einsum("snp,spd->snd", w_m, xyz_m)
                # The query's own frame stays anchored AT the query — the
                # query position is ground truth there and the init is the
                # only channel through which the model receives it.
                at_query = frame_idx[:, None] == query_t_c[None, :]  # [S, N]
                base_coords = jnp.where(
                    at_query[..., None],
                    jnp.broadcast_to(query_xyz_c[None], (s, n, 3)),
                    match_xyz,
                )
            else:
                base_coords = jnp.broadcast_to(query_xyz_c[None], (s, n, 3))
            base_vis = jnp.full((s, n), 10.0, jnp.float32)
            prev_tail = coords_last[hop:]
            if self.chain_velocity > 0.0 and hop >= 2:
                # First-order init of the frames beyond the overlap:
                # extrapolate the previous window's last inter-frame
                # displacement instead of freezing at the last position.
                vel = (prev_tail[-1] - prev_tail[-2]) * self.chain_velocity
                steps = jnp.arange(1, s - hop + 1, dtype=vel.dtype)
                new_frames = prev_tail[-1][None] + steps[:, None, None] * vel[None]
            else:
                new_frames = jnp.broadcast_to(prev_tail[-1:], (s - hop, n, 3))
            chained_coords = jnp.concatenate([prev_tail, new_frames], axis=0)
            prev_vis_tail = vis_last[hop:]
            chained_vis = jnp.concatenate(
                [prev_vis_tail, jnp.broadcast_to(prev_vis_tail[-1:], (s - hop, n))], axis=0
            )
            coords_init = jnp.where(chained[None, :, None], chained_coords, base_coords)
            vis_init = jnp.where(chained[None, :], chained_vis, base_vis)

            # Track-mask feature: the reference zeroes the global mask for
            # frames consumed by earlier windows (`mvtracker.py:695`), which
            # reduces to cutoff = query_t in the first window, else
            # max(query_t, prev_start + S) = max(query_t, w_start + S - hop).
            cutoff = jnp.where(
                is_first, query_t_c, jnp.maximum(query_t_c, w_start + (s - hop))
            )
            track_mask = (frame_idx[:, None] >= cutoff[None, :]).astype(jnp.float32)

            coord_preds, vis_logits = mdl.forward_iteration(
                context_w, coords_init, vis_init, track_mask, active, feat_init_c,
                iters=iters, geom_w=geom_w,
            )
            new_carry = (coord_preds[-1], vis_logits)
            ys = (jnp.stack(coord_preds), vis_logits, active)
            return new_carry, ys

        scanned = nn.scan(
            window_step,
            variable_broadcast="params",
            variable_axes={"intermediates": 0},
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )
        carry0 = (
            jnp.broadcast_to(query_xyz[None], (s, n, 3)),
            jnp.full((s, n), 10.0, jnp.float32),
        )
        geom = (depths, intrs, extrs) if self.vis_geom_features else None
        const = (context, geom, feat_init, query_t, query_xyz, qt_min)
        _, (all_coords, all_vis, all_active) = scanned(
            self, carry0, const, starts_dyn
        )
        # all_coords: [W, iters, S, N, 3]; all_vis: [W, S, N]; all_active: [W, N]

        # Compose the [T]-indexed outputs: for each frame, the LAST EXECUTED
        # window covering it wins (the reference overwrites the overlap,
        # `mvtracker.py:692-693`); frames before the anchor and inactive
        # points keep zeros, exactly like the reference's untouched
        # placeholder rows (`mvtracker.py:528-529`).
        t_idx = jnp.arange(t)
        w_of_t = jnp.clip((t_idx - qt_min) // hop, 0, n_exec - 1)  # [T]
        local_s = jnp.clip(t_idx - (qt_min + w_of_t * hop), 0, s - 1)  # [T]
        final_coords = all_coords[:, -1]  # [W, S, N, 3]
        traj = final_coords[w_of_t, local_s]  # [T, N, 3]
        vis = jax.nn.sigmoid(all_vis[w_of_t, local_s])  # [T, N]
        covered = (t_idx >= qt_min)[:, None]  # [T, 1] frames before anchor: zeros
        active_t = all_active[w_of_t] & covered  # [T, N]
        traj = jnp.where(active_t[..., None], traj, 0.0)
        vis = jnp.where(active_t, vis, 0.0)

        if norm_transform is not None:
            # Un-normalize outputs (reference `mvtracker.py:713-716,683-689`).
            scale, rot, trans = norm_transform
            traj = invert_scene_transform(scale, rot, trans, traj)
            all_coords = invert_scene_transform(scale, rot, trans, all_coords)

        out = {"traj": traj, "vis": vis, "feat_init": feat_init}
        if is_train:
            out["train_data"] = {
                "coord_predictions": all_coords,  # [W, iters, S, N, 3]
                "vis_predictions": all_vis,  # [W, S, N]
                "window_starts": starts_dyn,  # [W] traced (anchored at min query_t)
                # Windows the reference's while-loop would actually execute;
                # the rest are padding and must not enter the loss.
                "window_valid": jnp.arange(n_wind) < n_exec,  # [W]
                "window_active": all_active,  # [W, N]
            }
        return out
