"""Training losses (L7).

Numerics mirror the reference losses (`mvtracker/models/core/losses.py:22-73`)
and their assembly (`mvtracker/cli/train.py:78-229`), adapted to the static
stacked-window prediction format produced by
`mvtracker_tpu.models.mvtracker.MVTracker(is_train=True)`:

- predictions come as [W, iters, S, N, 3] / [W, S, N] with per-window active
  masks, instead of the reference's Python lists over a dynamic point set;
- ground truth is sliced per window with clamped frame indices, with padded
  frames and inactive points removed via the validity mask (masked means
  make this exactly equivalent to the reference's variable-length slices).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from mvtracker_tpu.utils.geometry import (
    bilinear_sample2d,
    reduce_masked_mean,
    world_to_pixel_xy_and_camera_z,
)


def window_gt(
    gt: jax.Array,  # [T, ...] per-frame ground truth
    window_starts: jax.Array,  # [W] (may be traced: anchored at min query_t)
    window_len: int,
) -> jax.Array:
    """Slice per-frame GT into [W, S, ...] windows with clamped frame indices."""
    t = gt.shape[0]
    idx = jnp.minimum(
        jnp.asarray(window_starts)[:, None] + jnp.arange(window_len)[None, :], t - 1
    )  # [W, S]
    return gt[idx]


def window_validity(
    valid: jax.Array,  # [T, N] bool/float — GT per-frame track validity
    query_t: jax.Array,  # [N]
    window_starts: jax.Array,  # [W] (may be traced)
    window_len: int,
    window_active: jax.Array,  # [W, N] bool
    num_frames: int,
    window_valid: jax.Array | None = None,  # [W] executed-window mask
) -> jax.Array:
    """[W, S, N] validity: GT-valid AND t >= query_t AND real frame AND active
    AND (when given) an executed window.

    The `t >= query_t` zeroing mirrors reference `cli/train.py:114-117`;
    the frame/active/window masking replaces the reference's dynamic slicing
    (`cli/train.py:143-157`) and dynamic window count (`mvtracker.py:537`).
    """
    s = window_len
    starts = jnp.asarray(window_starts)
    frame_no = starts[:, None] + jnp.arange(s)[None, :]  # [W, S] unclamped
    real = frame_no < num_frames  # [W, S]
    v = window_gt(valid.astype(jnp.float32), starts, s)  # [W, S, N]
    started = frame_no[:, :, None] >= query_t[None, None, :]  # [W, S, N]
    out = v * real[:, :, None] * started * window_active[:, None, :].astype(jnp.float32)
    if window_valid is not None:
        out = out * window_valid.astype(jnp.float32)[:, None, None]
    return out


def sequence_loss_3d(
    coord_predictions: jax.Array,  # [W, iters, S, N, 3]
    traj_gt_w: jax.Array,  # [W, S, N, 3]
    valids_w: jax.Array,  # [W, S, N]
    gamma: float = 0.8,
    dmin: float = 0.1,
    dmax: float = 65.0,
    dz: float = 128.0,
    window_valid: jax.Array | None = None,  # [W] executed-window mask
) -> jax.Array:
    """Discounted multi-iteration L1 flow loss.

    Mirrors reference `losses.py:49-73` (`sequence_loss_3d`): per refinement
    iteration i of I, weight gamma^(I-i-1); the z channel of both pred and GT
    is renormalized (z-dmin)/(dmax-dmin)*Dz; L1 averaged over xyz then
    masked-meaned over valid (window, frame, point); averaged over
    iterations; averaged over EXECUTED windows (the reference's Python list
    has exactly that many entries).
    """
    n_wind, n_iters = coord_predictions.shape[:2]
    z_scale = dz / (dmax - dmin)

    def renorm(x):
        return jnp.concatenate(
            [x[..., :2], (x[..., 2:] - dmin) * z_scale], axis=-1
        )

    gt = renorm(traj_gt_w)  # [W, S, N, 3]
    total = 0.0
    for i in range(n_iters):
        w_i = gamma ** (n_iters - i - 1)
        pred = renorm(coord_predictions[:, i])  # [W, S, N, 3]
        l1 = jnp.abs(pred - gt).mean(axis=-1)  # [W, S, N]
        # Masked mean per window, then summed over windows below.
        per_window = reduce_masked_mean(l1, valids_w, axis=(1, 2))  # [W]
        total = total + w_i * per_window
    if window_valid is None:
        return jnp.mean(total / n_iters)
    wv = window_valid.astype(total.dtype)
    return jnp.sum(total * wv / n_iters) / jnp.maximum(jnp.sum(wv), 1.0)


def balanced_ce_loss(
    vis_predictions: jax.Array,  # [W, S, N] logits
    vis_gt_w: jax.Array,  # [W, S, N] in [0, 1]
    valids_w: jax.Array,  # [W, S, N]
) -> jax.Array:
    """Pos/neg-balanced binary cross-entropy on visibility logits.

    Mirrors reference `losses.py:22-46` (`balanced_ce_loss`): stable
    logistic loss, positive (gt>0.95) and negative (gt<0.05) masked means
    computed separately and summed; summed (not averaged) over windows.
    """
    pos = (vis_gt_w > 0.95).astype(jnp.float32)
    neg = (vis_gt_w < 0.05).astype(jnp.float32)
    label = pos * 2.0 - 1.0
    a = -label * vis_predictions
    b = jax.nn.relu(a)
    loss = b + jnp.log(jnp.exp(-b) + jnp.exp(a - b))

    pos_loss = reduce_masked_mean(loss, pos * valids_w, axis=(1, 2))  # [W]
    neg_loss = reduce_masked_mean(loss, neg * valids_w, axis=(1, 2))
    return jnp.sum(pos_loss + neg_loss)


def tracking_loss(
    train_data: dict,
    traj_gt: jax.Array,  # [T, N, 3]
    vis_gt: jax.Array,  # [T, N] (any-view visibility)
    valid: jax.Array,  # [T, N]
    query_t: jax.Array,  # [N]
    num_frames: int,
    gamma: float = 0.8,
    track_upscaling_factor: float = 1.0,
    visibility_loss_weight: float = 0.1,
):
    """Full loss assembly; mirrors reference `cli/train.py:140-163`.

    Returns (total, dict of components).
    """
    starts = jnp.asarray(train_data["window_starts"])
    window_valid = train_data.get("window_valid")
    s = train_data["coord_predictions"].shape[2]
    valids_w = window_validity(
        valid, query_t, starts, s, train_data["window_active"], num_frames,
        window_valid=window_valid,
    )
    traj_gt_w = window_gt(traj_gt, starts, s)
    vis_gt_w = window_gt(vis_gt.astype(jnp.float32), starts, s)

    xyz_loss = (
        sequence_loss_3d(
            train_data["coord_predictions"], traj_gt_w, valids_w, gamma=gamma,
            window_valid=window_valid,
        )
        * track_upscaling_factor
    )
    vis_loss = (
        balanced_ce_loss(train_data["vis_predictions"], vis_gt_w, valids_w)
        * visibility_loss_weight
    )
    total = xyz_loss + vis_loss
    return total, {"xyz_loss": xyz_loss, "vis_loss": vis_loss}


def feature_identity_loss(
    fmaps: jax.Array,  # [V, T, h, w, C] encoder features (stride-downsampled)
    depths: jax.Array,  # [V, T, H, W] full-res depth
    intrs: jax.Array,  # [V, T, 3, 3]
    extrs: jax.Array,  # [V, T, 3, 4]
    traj_gt: jax.Array,  # [T, N, 3] world-space GT tracks
    stride: int,
    tau: float = 0.07,
    z_tol: float = 0.05,
) -> jax.Array:
    """Contrastive point-identity loss on encoder features (aux, round 4).

    The tracker's correlation pathway only carries gradient once encoder
    features discriminate surface points — but the encoder only receives
    gradient THROUGH that pathway, a chicken-and-egg that leaves
    multi-scene from-scratch training at the no-motion optimum (NOTES
    round 4: the same recipe that memorizes 2 scenes collapses at 16+).
    This loss supervises the encoder directly: the fused-cloud feature
    sampled at a GT track's position must match the track's prototype
    (its visibility-weighted mean feature across views/frames) and differ
    from every other track's — an N-way InfoNCE per (view, frame, track).
    No reference counterpart (the reference inherits features that already
    work at its 200k-step scale); weight 0 disables (reference parity).
    """
    v, t, h, w, c = fmaps.shape
    n = traj_gt.shape[1]
    pts = jnp.broadcast_to(traj_gt[None], (v, t, n, 3))
    pix, z = world_to_pixel_xy_and_camera_z(pts, intrs, extrs)
    z = z[..., 0]
    hw_h, hw_w = depths.shape[-2], depths.shape[-1]
    d_at = bilinear_sample2d(
        depths.reshape(v * t, hw_h, hw_w, 1),
        pix[..., 0].reshape(v * t, n),
        pix[..., 1].reshape(v * t, n),
    ).reshape(v, t, n)
    inb = (
        (pix[..., 0] >= 0) & (pix[..., 0] <= hw_w - 1)
        & (pix[..., 1] >= 0) & (pix[..., 1] <= hw_h - 1)
        & (z > 1e-3)
    )
    vis_w = (inb & (d_at > 0) & (d_at - z > -z_tol)).astype(jnp.float32)  # [V,T,N]

    feats = bilinear_sample2d(
        fmaps.reshape(v * t, h, w, c).astype(jnp.float32),
        (pix[..., 0] / stride).reshape(v * t, n),
        (pix[..., 1] / stride).reshape(v * t, n),
    ).reshape(v, t, n, c)
    # Safe normalization: sqrt(sum + eps) keeps the gradient finite at
    # zero vectors (out-of-view samples gather zeros; jnp.linalg.norm's
    # 0/0 grad would NaN the whole step even under a maximum() guard).
    def _safe_normalize(x):
        return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-10)

    feats = _safe_normalize(feats)

    s_sum = jnp.einsum("vtn,vtnc->nc", vis_w, feats)  # [N, C]
    proto = _safe_normalize(s_sum)
    # Leave-one-out prototype for each sample's OWN track (otherwise the
    # anchor leaks into its positive and random features already score
    # well below chance).
    loo = _safe_normalize(s_sum[None, None] - vis_w[..., None] * feats)

    logits = jnp.einsum("vtnc,mc->vtnm", feats, proto) / tau  # [V,T,N,M]
    own = jnp.einsum("vtnc,vtnc->vtn", feats, loo) / tau
    eye = jnp.eye(n, dtype=bool)[None, None]
    logits = jnp.where(eye, own[..., None], logits)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(
        logp, jnp.arange(n)[None, None, :, None], axis=-1
    )[..., 0]  # [V, T, N]
    return jnp.sum(nll * vis_w) / jnp.maximum(jnp.sum(vis_w), 1.0)
