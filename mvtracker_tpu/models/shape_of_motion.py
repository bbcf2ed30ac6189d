"""Shape-of-Motion optimization baseline, TPU-native.

Reference: ``mvtracker/models/core/shape-of-motion/`` (flow3d package,
~8 kLoC) — an offline per-scene optimizer that represents a dynamic scene as

* static background gaussians,
* foreground gaussians whose per-frame rigid motion is a **convex blend of
  K shared SE(3) motion bases**: per-basis continuous-6D rotations ``[K, T, 6]``
  and translations ``[K, T, 3]``, blended by per-gaussian coefficients
  ``[G, K]`` (``flow3d/params.py::MotionBases.compute_transforms``), and

fits them to RGB (+ optional depth / mask / 2D-track supervision) with the
gsplat CUDA rasterizer. 3D tracks are read off the optimized motion field.

TPU-first redesign: rendering uses :mod:`mvtracker_tpu.ops.gsplat`; the
whole fit is one ``lax.scan`` of Adam steps over randomly sampled frames —
static shapes, no per-frame python, resumable. Track queries attach to
nearby foreground gaussians by gaussian influence and move with the blended
SE(3) field (distance-weighted), rather than the reference's per-gaussian
argmax, which makes extraction differentiable and noise-robust; set
``topk=1`` for reference-style hard attachment.

Densification is intentionally omitted (the fixed-capacity machinery lives
in :mod:`mvtracker_tpu.models.dynamic3dgs`); initialize with enough
gaussians instead. Outputs feed the evaluator's cached-prediction path like
the reference (``evaluator_3dpt.py:497-514``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from mvtracker_tpu.ops import gsplat
from mvtracker_tpu.ops.knn import knn


@dataclasses.dataclass(frozen=True)
class SOMConfig:
    num_bases: int = 10  # K motion bases (flow3d default 10)
    iters: int = 2000
    segment_iters: int = 200
    lr_means: float = 1.6e-4
    lr_colors: float = 2.5e-3
    lr_quats: float = 1e-3
    lr_opacities: float = 5e-2
    lr_scales: float = 5e-3
    lr_motion_coefs: float = 1e-2
    lr_motion_bases: float = 1.6e-4
    w_rgb: float = 1.0
    w_mask: float = 1.0
    w_depth: float = 0.5
    w_track: float = 2.0
    w_smooth_bases: float = 0.1
    w_scale_var: float = 0.01
    tracks_per_step: int = 64


class MotionBases(NamedTuple):
    rots: jax.Array  # [K, T, 6] cont-6d
    transls: jax.Array  # [K, T, 3]

    @property
    def num_bases(self):
        return self.rots.shape[0]

    @property
    def num_frames(self):
        return self.rots.shape[1]


def compute_transforms(bases: MotionBases, ts: jax.Array, coefs: jax.Array) -> jax.Array:
    """Blend bases at frame indices ts [B] with coefs [G, K] -> [G, B, 3, 4].

    Mirrors flow3d ``MotionBases.compute_transforms``: the 6-D rotation
    parameters and translations are blended linearly, THEN orthonormalized.
    """
    transls = jnp.einsum("gk,kbi->gbi", coefs, bases.transls[:, ts])  # [G,B,3]
    rots = jnp.einsum("gk,kbi->gbi", coefs, bases.rots[:, ts])  # [G,B,6]
    rmats = gsplat.cont6d_to_rotmat(rots)  # [G,B,3,3]
    return jnp.concatenate([rmats, transls[..., None]], axis=-1)


class SOMParams(NamedTuple):
    """Trainable scene parameters. Foreground first (G_fg), background after."""

    fg_means: jax.Array  # [Gf, 3] canonical (frame-0) positions
    fg_quats: jax.Array  # [Gf, 4]
    fg_log_scales: jax.Array  # [Gf, 3]
    fg_logit_opacities: jax.Array  # [Gf]
    fg_colors: jax.Array  # [Gf, 3]
    motion_coefs: jax.Array  # [Gf, K] (softmaxed before blending)
    motion_rots: jax.Array  # [K, T, 6]
    motion_transls: jax.Array  # [K, T, 3]
    bg_means: jax.Array  # [Gb, 3]
    bg_quats: jax.Array  # [Gb, 4]
    bg_log_scales: jax.Array  # [Gb, 3]
    bg_logit_opacities: jax.Array  # [Gb]
    bg_colors: jax.Array  # [Gb, 3]


def _coef_weights(motion_coefs: jax.Array) -> jax.Array:
    """flow3d stores raw coefficients and softmaxes them (params.py get_coefs)."""
    return jax.nn.softmax(motion_coefs, axis=-1)


def fg_poses_at(params: SOMParams, ts: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Foreground means/quats at frame indices ts [B] -> ([Gf,B,3],[Gf,B,4])."""
    bases = MotionBases(params.motion_rots, params.motion_transls)
    coefs = _coef_weights(params.motion_coefs)
    tf = compute_transforms(bases, ts, coefs)  # [G,B,3,4]
    means = jnp.einsum("gbij,gj->gbi", tf[..., :3], params.fg_means) + tf[..., 3]
    # Rotation composition: R_t @ R_canonical, via quaternions.
    rq = _rotmat_to_quat(tf[..., :3])  # [G,B,4]
    quats = gsplat.quat_multiply(rq, params.fg_quats[:, None, :])
    return means, quats


def _rotmat_to_quat(r: jax.Array) -> jax.Array:
    """Rotation matrix [..., 3, 3] -> wxyz quaternion, branchless Shepperd."""
    m00, m01, m02 = r[..., 0, 0], r[..., 0, 1], r[..., 0, 2]
    m10, m11, m12 = r[..., 1, 0], r[..., 1, 1], r[..., 1, 2]
    m20, m21, m22 = r[..., 2, 0], r[..., 2, 1], r[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically largest pivot.
    qw = jnp.stack(
        [1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22, 1 - m00 - m11 + m22], -1
    )
    qw = jnp.sqrt(jnp.clip(qw, 1e-12)) / 2  # [..., 4] candidate pivots
    case = jnp.argmax(qw, axis=-1)

    w0, x0 = qw[..., 0], (m21 - m12) / (4 * qw[..., 0])
    y0, z0 = (m02 - m20) / (4 * qw[..., 0]), (m10 - m01) / (4 * qw[..., 0])
    x1, w1 = qw[..., 1], (m21 - m12) / (4 * qw[..., 1])
    y1, z1 = (m01 + m10) / (4 * qw[..., 1]), (m02 + m20) / (4 * qw[..., 1])
    y2, w2 = qw[..., 2], (m02 - m20) / (4 * qw[..., 2])
    x2, z2 = (m01 + m10) / (4 * qw[..., 2]), (m12 + m21) / (4 * qw[..., 2])
    z3, w3 = qw[..., 3], (m10 - m01) / (4 * qw[..., 3])
    x3, y3 = (m02 + m20) / (4 * qw[..., 3]), (m12 + m21) / (4 * qw[..., 3])

    q = jnp.stack(
        [
            jnp.stack([w0, x0, y0, z0], -1),
            jnp.stack([w1, x1, y1, z1], -1),
            jnp.stack([w2, x2, y2, z2], -1),
            jnp.stack([w3, x3, y3, z3], -1),
        ],
        axis=-2,
    )  # [..., 4 cases, 4]
    q = jnp.take_along_axis(q, case[..., None, None], axis=-2)[..., 0, :]
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)


def init_params(
    fg_xyz: np.ndarray,
    fg_rgb: np.ndarray,
    bg_xyz: np.ndarray,
    bg_rgb: np.ndarray,
    num_frames: int,
    cfg: SOMConfig,
    seed: int = 0,
) -> SOMParams:
    """Initialize from segmented point clouds (flow3d init_utils: scales
    from kNN spacing, identity motion bases, coefficients from k-means-ish
    spatial clusters — here: soft assignment to K FPS-sampled cluster
    centers, which seeds spatially coherent basis ownership)."""
    rng = np.random.default_rng(seed)

    def scales_of(xyz):
        b = jnp.asarray(xyz)[None]
        d, _ = knn(b, b, k=min(4, len(xyz)))
        if d.shape[-1] == 1:  # single point: no neighbor spacing to measure
            sq = np.full((len(xyz),), 1e-2)
        else:
            sq = np.clip(np.asarray(d[0, :, 1:] ** 2).mean(-1), 1e-7, None)
        return np.tile(np.log(np.sqrt(sq))[:, None], (1, 3))

    k = cfg.num_bases
    # FPS-ish cluster centers: greedy random subset (cheap, seeded).
    centers = fg_xyz[rng.choice(len(fg_xyz), size=min(k, len(fg_xyz)), replace=False)]
    if len(centers) < k:
        centers = np.concatenate([centers] * (k // len(centers) + 1))[:k]
    d2 = ((fg_xyz[:, None] - centers[None]) ** 2).sum(-1)
    coefs = -d2 / np.clip(d2.mean(), 1e-8, None)  # logits: near cluster -> high

    ident_rot = np.tile(
        np.array([1, 0, 0, 0, 1, 0], np.float32), (k, num_frames, 1)
    )  # identity in cont-6d
    return SOMParams(
        fg_means=jnp.asarray(fg_xyz, jnp.float32),
        fg_quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (len(fg_xyz), 1)),
        fg_log_scales=jnp.asarray(scales_of(fg_xyz), jnp.float32),
        fg_logit_opacities=jnp.zeros((len(fg_xyz),)),
        fg_colors=jnp.asarray(fg_rgb, jnp.float32),
        motion_coefs=jnp.asarray(coefs, jnp.float32),
        motion_rots=jnp.asarray(ident_rot),
        motion_transls=jnp.zeros((k, num_frames, 3)),
        bg_means=jnp.asarray(bg_xyz, jnp.float32),
        bg_quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (len(bg_xyz), 1)),
        bg_log_scales=jnp.asarray(scales_of(bg_xyz), jnp.float32),
        bg_logit_opacities=jnp.zeros((len(bg_xyz),)),
        bg_colors=jnp.asarray(bg_rgb, jnp.float32),
    )


def _lr_tree(cfg: SOMConfig) -> dict:
    return {
        "fg_means": cfg.lr_means,
        "fg_quats": cfg.lr_quats,
        "fg_log_scales": cfg.lr_scales,
        "fg_logit_opacities": cfg.lr_opacities,
        "fg_colors": cfg.lr_colors,
        "motion_coefs": cfg.lr_motion_coefs,
        "motion_rots": cfg.lr_motion_bases,
        "motion_transls": cfg.lr_motion_bases,
        "bg_means": cfg.lr_means,
        "bg_quats": cfg.lr_quats,
        "bg_log_scales": cfg.lr_scales,
        "bg_logit_opacities": cfg.lr_opacities,
        "bg_colors": cfg.lr_colors,
    }


def render_frame(
    params: SOMParams,
    t: jax.Array,
    intr: jax.Array,
    w2c: jax.Array,
    img_wh: tuple[int, int],
    chunk: int = 1024,
):
    """Render frame t: moving fg + static bg in one pass. The 4th attribute
    channel carries the fg indicator, so ``rgb[..., 3]`` is the rendered
    foreground mask (flow3d renders a separate mask pass)."""
    fg_means, fg_quats = fg_poses_at(params, jnp.asarray([t]).reshape(1))
    means = jnp.concatenate([fg_means[:, 0], params.bg_means])
    quats = jnp.concatenate([fg_quats[:, 0], params.bg_quats])
    scales = jnp.concatenate([params.fg_log_scales, params.bg_log_scales])
    opac = jnp.concatenate([params.fg_logit_opacities, params.bg_logit_opacities])
    nf, nb = params.fg_means.shape[0], params.bg_means.shape[0]
    fg_flag = jnp.concatenate([jnp.ones((nf, 1)), jnp.zeros((nb, 1))])
    attrs = jnp.concatenate(
        [jnp.concatenate([params.fg_colors, params.bg_colors]), fg_flag], axis=-1
    )
    return gsplat.render_gaussians(
        means, quats, scales, opac, attrs, intr, w2c, img_wh, chunk=chunk
    )


@partial(jax.jit, static_argnames=("cfg", "img_wh", "n_iters", "chunk"))
def fit_segment(
    params: SOMParams,
    opt_state: tuple,
    data: dict,
    key: jax.Array,
    cfg: SOMConfig,
    img_wh: tuple[int, int],
    n_iters: int,
    chunk: int = 1024,
):
    """n_iters Adam steps; each samples one (frame, view) uniformly.

    data: video [V,T,H,W,3], depth [V,T,H,W] (0 = missing), mask [V,T,H,W],
    intrs [V,3,3], w2cs [V,3,4], plus optional sparse 3D track supervision
    tracks3d [Nt,T,3] with tracks3d_valid [Nt,T] (flow3d supervises with
    lifted 2D tracks; we supervise the motion field directly with them).
    """
    lrs = _lr_tree(cfg)
    v = data["video"].shape[0]
    t_total = data["video"].shape[1]
    has_tracks = "tracks3d" in data

    def loss_fn(p: SOMParams, key):
        kf, kv, kt = jax.random.split(key, 3)
        t = jax.random.randint(kf, (), 0, t_total)
        vi = jax.random.randint(kv, (), 0, v)
        out = render_frame(p, t, data["intrs"][vi], data["w2cs"][vi], img_wh, chunk)
        im, mask_r = out.rgb[..., :3], out.rgb[..., 3]
        gt_im = data["video"][vi, t]
        losses = {
            "rgb": 0.8 * jnp.abs(im - gt_im).mean()
            + 0.2 * (1.0 - gsplat.ssim(im, gt_im))
        }
        if "mask" in data:
            losses["mask"] = ((mask_r - data["mask"][vi, t]) ** 2).mean()
        if "depth" in data:
            gt_d = data["depth"][vi, t]
            valid = (gt_d > 0).astype(im.dtype)
            # Expected depth is alpha-weighted; normalize by alpha.
            d = out.depth / jnp.clip(out.alpha, 1e-6)
            losses["depth"] = (valid * jnp.abs(d - gt_d)).sum() / jnp.clip(valid.sum(), 1)
        if has_tracks:
            # Sparse 3D supervision: points attached to the motion field at
            # their first-valid frame must land on the GT track at frame t.
            tr = data["tracks3d"]  # [Nt, T, 3]
            tv = data["tracks3d_valid"]  # [Nt, T]
            n_tr = tr.shape[0]
            sel = jax.random.randint(kt, (cfg.tracks_per_step,), 0, n_tr)
            # Attach each track at its FIRST VALID frame (as documented):
            # frame-0 entries of late-appearing tracks are placeholders and
            # would anchor the canonical coordinate at garbage positions.
            first_valid = jnp.argmax(tv[sel].astype(jnp.int32), axis=1)  # [K]
            anchor = jnp.take_along_axis(
                tr[sel], first_valid[:, None, None], axis=1
            )[:, 0]
            pred = track_points(
                p, anchor, first_valid.astype(jnp.int32),
                jnp.asarray([t]).reshape(1), topk=8,
            )[:, 0]
            w_valid = tv[sel, t].astype(im.dtype)[:, None]
            losses["track"] = (
                jnp.abs(pred - tr[sel, t]) * w_valid
            ).sum() / jnp.clip(w_valid.sum() * 3, 1)
        # Basis smoothness: second difference over time (flow3d
        # compute_se3_smoothness_loss). Needs >= 3 frames (shape known at
        # trace time; an empty mean would be NaN).
        if t_total >= 3:
            losses["smooth_bases"] = 0.0
            for arr in (p.motion_rots, p.motion_transls):
                accel = arr[:, 2:] - 2 * arr[:, 1:-1] + arr[:, :-2]
                losses["smooth_bases"] = losses["smooth_bases"] + (accel**2).mean()
        # Scale isotropy (flow3d w_scale_var): variance across the 3 axes.
        losses["scale_var"] = jnp.var(p.fg_log_scales, axis=-1).mean()

        weights = {
            "rgb": cfg.w_rgb, "mask": cfg.w_mask, "depth": cfg.w_depth,
            "track": cfg.w_track, "smooth_bases": cfg.w_smooth_bases,
            "scale_var": cfg.w_scale_var,
        }
        return sum(weights[k] * v_ for k, v_ in losses.items())

    def step(carry, key):
        p, (mu, nu, count) = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        gd = grads._asdict()
        count = count + 1
        tc = count.astype(jnp.float32)
        new_vals = {}
        for k, g in gd.items():
            mu_k = 0.9 * mu[k] + 0.1 * g
            nu_k = 0.999 * nu[k] + 0.001 * g * g
            mhat = mu_k / (1 - 0.9**tc)
            nhat = nu_k / (1 - 0.999**tc)
            new_vals[k] = getattr(p, k) - lrs[k] * mhat / (jnp.sqrt(nhat) + 1e-15)
            mu[k], nu[k] = mu_k, nu_k
        return (SOMParams(**new_vals), (mu, nu, count)), loss

    keys = jax.random.split(key, n_iters)
    (params, opt_state), losses = lax.scan(step, (params, opt_state), keys)
    return params, opt_state, losses


def adam_init(params: SOMParams) -> tuple:
    zeros = {k: jnp.zeros_like(v) for k, v in params._asdict().items()}
    return (dict(zeros), {k: v.copy() for k, v in zeros.items()}, jnp.zeros((), jnp.int32))


def fit_scene(
    video: np.ndarray,  # [V, T, H, W, 3] in [0, 1]
    intrs: np.ndarray,  # [V, 3, 3]
    w2cs: np.ndarray,  # [V, 3, 4]
    fg_xyz: np.ndarray,
    fg_rgb: np.ndarray,
    bg_xyz: np.ndarray,
    bg_rgb: np.ndarray,
    depth: np.ndarray | None = None,
    mask: np.ndarray | None = None,
    tracks3d: np.ndarray | None = None,
    tracks3d_valid: np.ndarray | None = None,
    cfg: SOMConfig = SOMConfig(),
    seed: int = 0,
    chunk: int = 1024,
    progress: bool = False,
) -> SOMParams:
    """Optimize the scene representation (flow3d Trainer.train loop)."""
    v, t_total, h, w = video.shape[:4]
    params = init_params(fg_xyz, fg_rgb, bg_xyz, bg_rgb, t_total, cfg, seed)
    opt_state = adam_init(params)
    data = {
        "video": jnp.asarray(video),
        "intrs": jnp.asarray(intrs),
        "w2cs": jnp.asarray(w2cs),
    }
    if depth is not None:
        data["depth"] = jnp.asarray(depth)
    if mask is not None:
        data["mask"] = jnp.asarray(mask)
    if tracks3d is not None:
        data["tracks3d"] = jnp.asarray(tracks3d)
        data["tracks3d_valid"] = jnp.asarray(
            tracks3d_valid
            if tracks3d_valid is not None
            else np.ones(tracks3d.shape[:2], bool)
        )
    key = jax.random.PRNGKey(seed)
    it = 0
    while it < cfg.iters:
        n = min(cfg.segment_iters, cfg.iters - it)
        key, k = jax.random.split(key)
        params, opt_state, losses = fit_segment(
            params, opt_state, data, k, cfg, (w, h), n, chunk
        )
        it += n
        if progress:
            print(f"iter {it}: loss {float(losses[-1]):.4f}")
    return params


def track_points(
    params: SOMParams,
    query_xyz: jax.Array,  # [N, 3] world positions
    query_t: jax.Array,  # [N] frame index of each query
    ts: jax.Array,  # [B] frames to evaluate
    topk: int = 8,
) -> jax.Array:
    """Move query points with the optimized motion field -> [N, B, 3].

    Each query attaches to its topk most influential fg gaussians AT ITS OWN
    TIMESTEP; its canonical-frame coordinate is solved by inverting the
    blended transform, then pushed through all requested frames. Influence-
    weighted blend over topk (reference track_3d uses hard argmax; topk=1
    reproduces that)."""
    bases = MotionBases(params.motion_rots, params.motion_transls)
    coefs = _coef_weights(params.motion_coefs)

    # Transforms of every fg gaussian at each query's own frame: [G, N, 3, 4]
    tf_q = compute_transforms(bases, query_t, coefs)
    means_q = (
        jnp.einsum("gnij,gj->gni", tf_q[..., :3], params.fg_means) + tf_q[..., 3]
    )  # [G, N, 3]

    # Influence of each gaussian at each query point (at the query frame).
    rq = _rotmat_to_quat(tf_q[..., :3])  # [G, N, 4]
    quats_q = gsplat.quat_multiply(rq, params.fg_quats[:, None, :])
    diff = query_xyz[None] - means_q  # [G, N, 3]
    rmat = gsplat.quat_to_rotmat(quats_q)  # [G, N, 3, 3]
    local = jnp.einsum("gnij,gni->gnj", rmat, diff)
    maha = jnp.sum((local * jnp.exp(-params.fg_log_scales)[:, None]) ** 2, -1)
    infl = jax.nn.sigmoid(params.fg_logit_opacities)[:, None] * jnp.exp(-0.5 * maha)

    w_topk, idx = lax.top_k(infl.T, topk)  # [N, topk]
    w_topk = w_topk / jnp.clip(w_topk.sum(-1, keepdims=True), 1e-12)

    # Canonical coords of the query w.r.t. each attached gaussian:
    # x_canon = R_q^T (x - t_q) through that gaussian's blended transform.
    tf_nk = jnp.take_along_axis(
        jnp.moveaxis(tf_q, 1, 0), idx[..., None, None], axis=1
    )  # [N, topk, 3, 4]
    r_nk, t_nk = tf_nk[..., :3], tf_nk[..., 3]
    x_canon = jnp.einsum(
        "nkji,nkj->nki", r_nk, query_xyz[:, None] - t_nk
    )  # R^T (x - t): [N, topk, 3]

    # Push through all requested frames.
    tf_all = compute_transforms(bases, ts, coefs)  # [G, B, 3, 4]
    coef_sel = coefs[idx]  # [N, topk, K]
    r_all = gsplat.cont6d_to_rotmat(
        jnp.einsum("nkc,cbi->nkbi", coef_sel, bases.rots[:, ts])
    )  # [N, topk, B, 3, 3]
    t_all = jnp.einsum("nkc,cbi->nkbi", coef_sel, bases.transls[:, ts])
    moved = jnp.einsum("nkbij,nkj->nkbi", r_all, x_canon) + t_all  # [N,topk,B,3]
    return jnp.einsum("nkbi,nk->nbi", moved, w_topk)


def extract_tracks(
    params: SOMParams,
    query_points: np.ndarray,  # [N, 4] (t, x, y, z)
    t_total: int,
    depths: np.ndarray | None = None,  # [V, T, H, W]
    intrs: np.ndarray | None = None,
    w2cs: np.ndarray | None = None,
    vis_threshold: float = 0.02,
    topk: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Tracks + per-frame visibility for evaluator export -> ([T,N,3], [T,N])."""
    qxyz = jnp.asarray(query_points[:, 1:4])
    qt = jnp.asarray(query_points[:, 0].astype(np.int32))
    ts = jnp.arange(t_total)
    tracks = np.asarray(track_points(params, qxyz, qt, ts, topk)).transpose(1, 0, 2)

    n = tracks.shape[1]
    if depths is None:
        vis = np.ones((t_total, n), bool)
    else:
        from mvtracker_tpu.utils.misc import depth_ztest_visibility

        vis = depth_ztest_visibility(tracks, depths, intrs, w2cs, vis_threshold)
    return tracks, vis
