"""Training-time scene augmentations (L4), host-side numpy.

Mirrors the reference Kubric training augmentations
(`mvtracker/datasets/kubric_multiview_dataset.py:1276-1721`):

- photometric: per-view (or shared) brightness/contrast/saturation jitter,
  gaussian blur (:1276-1404);
- spatial: random crop with intrinsics principal-point/center update and
  2D track shifting (:1405-1655);
- depth corruption: global scale/shift plus rectangular erasures
  (:1656-1721), complementing the patch-wise `aug_depth`
  (`datasets/utils.py:332`);
- scene-level: random similarity transform + camera parameter noise
  (`datasets/utils.py:210,304`).

All functions are pure (Datapoint in -> Datapoint out) and take an explicit
rng, matching the reference's per-sample seeded determinism (:475-484).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from mvtracker_tpu import native
from mvtracker_tpu.datasets.datapoint import (
    Datapoint,
    add_camera_noise,
    aug_depth,
    transform_scene,
)


def photometric_augment(
    dp: Datapoint,
    rng: np.random.Generator,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    blur_prob: float = 0.2,
    per_view: bool = True,
) -> Datapoint:
    """Color jitter + optional blur; tracks/geometry untouched."""
    video = dp.video.astype(np.float32).copy()
    v = video.shape[0]
    n_groups = v if per_view else 1
    for g in range(n_groups):
        sel = slice(g, g + 1) if per_view else slice(None)
        b = 1.0 + rng.uniform(-brightness, brightness)
        c = 1.0 + rng.uniform(-contrast, contrast)
        s = 1.0 + rng.uniform(-saturation, saturation)
        x = video[sel]
        # Jitter through the native kernel (C++/OpenMP, numpy fallback);
        # the group mean is computed here so per-group semantics survive
        # the kernel's per-image layout.
        lead = x.shape[:-3]
        flat = x.reshape((-1,) + x.shape[-3:])
        n_img = flat.shape[0]
        mean = np.full(n_img, x.mean(), np.float32)
        flat = native.photometric_jitter(
            flat, mean,
            np.full(n_img, b, np.float32),
            np.full(n_img, c, np.float32),
            np.full(n_img, s, np.float32),
        )
        x = flat.reshape(lead + x.shape[-3:])
        if rng.uniform() < blur_prob:
            x = native.gaussian_blur(x.swapaxes(-1, -3), 5, 1.0).swapaxes(-1, -3)
        video[sel] = x
    return dataclasses.replace(dp, video=np.clip(video, 0, 255))


def crop_augment(
    dp: Datapoint,
    rng: np.random.Generator,
    crop_h: int,
    crop_w: int,
) -> Datapoint:
    """Random crop (same offset across frames, per view) with intrinsics
    principal-point update and 2D-track shift; visibility is re-clipped to
    the crop (reference :1405-1655)."""
    v, t, h, w, _ = dp.video.shape
    assert crop_h <= h and crop_w <= w
    video = np.empty((v, t, crop_h, crop_w, 3), dp.video.dtype)
    depth = np.empty((v, t, crop_h, crop_w), dp.videodepth.dtype)
    intrs = dp.intrs.copy()
    traj = dp.trajectory.copy() if dp.trajectory is not None else None
    vis = dp.visibility.copy() if dp.visibility is not None else None

    for vi in range(v):
        y0 = int(rng.integers(0, h - crop_h + 1))
        x0 = int(rng.integers(0, w - crop_w + 1))
        video[vi] = dp.video[vi, :, y0 : y0 + crop_h, x0 : x0 + crop_w]
        depth[vi] = dp.videodepth[vi, :, y0 : y0 + crop_h, x0 : x0 + crop_w]
        intrs[vi, :, 0, 2] -= x0
        intrs[vi, :, 1, 2] -= y0
        if traj is not None:
            traj[vi, ..., 0] -= x0
            traj[vi, ..., 1] -= y0
            if vis is not None:
                inb = (
                    (traj[vi, ..., 0] >= 0)
                    & (traj[vi, ..., 0] < crop_w)
                    & (traj[vi, ..., 1] >= 0)
                    & (traj[vi, ..., 1] < crop_h)
                )
                vis[vi] &= inb
    return dataclasses.replace(
        dp, video=video, videodepth=depth, intrs=intrs, trajectory=traj, visibility=vis
    )


def depth_corruption_augment(
    dp: Datapoint,
    rng: np.random.Generator,
    erase_prob: float = 0.3,
    max_erases: int = 3,
    patch_aug_prob: float = 0.5,
) -> Datapoint:
    """Depth-only corruption: rectangular zero-erasures (simulating sensor
    dropouts) + patch-wise scale/shift (reference :1656-1721 and
    `aug_depth`). Ground truth is untouched — the model must be robust."""
    depth = dp.videodepth.copy()
    v, t, h, w = depth.shape
    for vi in range(v):
        if rng.uniform() < erase_prob:
            for _ in range(int(rng.integers(1, max_erases + 1))):
                eh = int(rng.integers(h // 8, h // 3))
                ew = int(rng.integers(w // 8, w // 3))
                y0 = int(rng.integers(0, h - eh))
                x0 = int(rng.integers(0, w - ew))
                depth[vi, :, y0 : y0 + eh, x0 : x0 + ew] = 0.0
    if rng.uniform() < patch_aug_prob:
        depth = aug_depth(depth, rng=rng)
    return dataclasses.replace(dp, videodepth=depth)


def scene_transform_augment(
    dp: Datapoint,
    rng: np.random.Generator,
    max_scale: float = 1.5,
    max_translation: float = 1.0,
    rotate: bool = True,
) -> Datapoint:
    """Random global similarity transform of the whole scene
    (reference `transform_scene` usage in training)."""
    s = float(np.exp(rng.uniform(-np.log(max_scale), np.log(max_scale))))
    if rotate:
        theta = rng.uniform(0, 2 * np.pi)
        c, si = np.cos(theta), np.sin(theta)
        rot = np.array([[c, -si, 0], [si, c, 0], [0, 0, 1.0]])
    else:
        rot = np.eye(3)
    trans = rng.uniform(-max_translation, max_translation, size=3)

    depth, extrs, qp, traj3d, traj2d = transform_scene(
        s, rot, trans,
        depth=dp.videodepth,
        extrs=dp.extrs,
        query_points=dp.query_points_3d,
        traj3d_world=dp.trajectory_3d,
        traj2d_w_z=dp.trajectory,
    )
    return dataclasses.replace(
        dp,
        videodepth=depth,
        extrs=extrs,
        query_points_3d=qp,
        trajectory_3d=traj3d,
        trajectory=traj2d,
        track_upscaling_factor=dp.track_upscaling_factor / s,
    )


def camera_noise_augment(
    dp: Datapoint, rng: np.random.Generator, std_intr=0.01, std_extr=0.001
) -> Datapoint:
    intrs, extrs = add_camera_noise(dp.intrs, dp.extrs, std_intr, std_extr, rng)
    return dataclasses.replace(
        dp, intrs=intrs.astype(np.float32), extrs=extrs.astype(np.float32)
    )


def default_train_augmentations(dp: Datapoint, rng: np.random.Generator) -> Datapoint:
    """The standard training augmentation stack."""
    dp = photometric_augment(dp, rng)
    dp = depth_corruption_augment(dp, rng)
    dp = scene_transform_augment(dp, rng, rotate=True)
    return dp
