"""Generic unlabeled scene dataset (L4).

Re-design of reference `mvtracker/datasets/generic_scene_dataset.py:20-927`
(EgoExo4D / 4D-Dress / Hi4D / SelfCap style scenes): per-view rgb/depth
directories + camera parameters, no GT tracks — evaluation queries come
from depth sampling (`evaluation/query_sampling.py`).

Expected layout (the reference's, minus estimator side-channels):

    scene_dir/
      cameras.npz            {intrinsics [V,3,3] or [V,T,3,3],
                              extrinsics [V,3,4] or [V,T,3,4]}
      view_<i>/rgb/*.png|jpg
      view_<i>/depth/*.npy (float meters) or 16-bit png (mm)
      view_<i>/depth_conf/*.npy (optional confidence)

Depth synthesis via VGGT/MoGe/MonoFusion in the reference
(`generic_scene_dataset.py:361-927`) is an external-network concern; this
loader consumes their precomputed outputs when present. The automatic
scene normalization (ground plane ~ XY, reference :288-360) is provided as
`estimate_scene_normalization`.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from mvtracker_tpu.datasets.datapoint import Datapoint, align_umeyama


def estimate_scene_normalization(
    depths: np.ndarray,  # [V, T, H, W]
    intrs: np.ndarray,  # [V, T, 3, 3]
    extrs: np.ndarray,  # [V, T, 3, 4]
    stride: int = 8,
    ground_percentile: float = 5.0,
) -> tuple[float, np.ndarray, np.ndarray]:
    """Estimate (scale, R, t) so the ground sits near z=0 and the scene is
    unit-ish scale; assumes gravity ~ -z after camera-up voting (reference
    `generic_scene_dataset.py:288-360` analog)."""
    import jax.numpy as jnp

    from mvtracker_tpu.utils import geometry as geo

    pts = []
    for vi in range(depths.shape[0]):
        d = depths[vi, 0, ::stride, ::stride]
        world = np.asarray(
            geo.unproject_depth_to_world(
                jnp.asarray(d)[None],
                geo.invert_intrinsics(jnp.asarray(intrs[vi, 0]))[None],
                geo.invert_extrinsics(jnp.asarray(extrs[vi, 0]))[None],
                stride,
            )[0]
        )
        pts.append(world[d > 0])
    pts = np.concatenate(pts, axis=0)
    if len(pts) == 0:
        return 1.0, np.eye(3), np.zeros(3)

    ground_z = np.percentile(pts[:, 2], ground_percentile)
    center = np.median(pts, axis=0)
    spread = np.percentile(np.linalg.norm(pts - center, axis=1), 90)
    scale = 1.0 / max(spread, 1e-6)
    translation = -np.array([center[0], center[1], ground_z]) * scale
    return float(scale), np.eye(3), translation


def _load_frames(path: str) -> np.ndarray:
    import imageio.v3 as iio

    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg", ".jpeg", ".npy"))
    )
    frames = []
    for f in files:
        p = os.path.join(path, f)
        if f.endswith(".npy"):
            frames.append(np.load(p))
        else:
            arr = np.asarray(iio.imread(p))
            if arr.dtype == np.uint16:  # mm depth png
                arr = arr.astype(np.float32) / 1000.0
            frames.append(arr)
    return np.stack(frames)


class GenericSceneDataset:
    def __init__(
        self,
        data_root: str,
        view_subset: Optional[list[int]] = None,
        normalize_scene: bool = False,
        max_frames: Optional[int] = None,
    ):
        self.data_root = data_root
        self.view_subset = view_subset
        self.normalize_scene = normalize_scene
        self.max_frames = max_frames
        self.seq_names = sorted(
            d
            for d in os.listdir(data_root)
            if os.path.isdir(os.path.join(data_root, d))
            and os.path.exists(os.path.join(data_root, d, "cameras.npz"))
        )

    def __len__(self):
        return len(self.seq_names)

    def __getitem__(self, index: int) -> Datapoint:
        path = os.path.join(self.data_root, self.seq_names[index])
        cams = np.load(os.path.join(path, "cameras.npz"))
        intrs = cams["intrinsics"].astype(np.float32)
        extrs = cams["extrinsics"].astype(np.float32)

        # Numeric sort: lexicographic order pairs view_10 with camera row 2
        # in 10+-view scenes (kubric.py sorts the same way).
        view_dirs = sorted(
            (d for d in os.listdir(path) if d.startswith("view_")),
            key=lambda s: int(s.split("_")[-1]),
        )
        views = self.view_subset or list(range(len(view_dirs)))

        rgbs, depths, confs = [], [], []
        for v in views:
            vp = os.path.join(path, view_dirs[v])
            rgbs.append(_load_frames(os.path.join(vp, "rgb"))[..., :3].astype(np.float32))
            depths.append(_load_frames(os.path.join(vp, "depth")).astype(np.float32))
            cp = os.path.join(vp, "depth_conf")
            confs.append(_load_frames(cp).astype(np.float32) if os.path.isdir(cp) else None)

        video = np.stack(rgbs)
        depth = np.stack(depths)
        if depth.ndim == 5:
            depth = depth[..., 0]
        t = video.shape[1]
        if self.max_frames and t > self.max_frames:
            t = self.max_frames
            video, depth = video[:, :t], depth[:, :t]

        if intrs.ndim == 3:
            intrs = np.repeat(intrs[:, None], t, axis=1)
        if extrs.ndim == 3:
            extrs = np.repeat(extrs[:, None], t, axis=1)
        intrs = intrs[views][:, :t]
        extrs = extrs[views][:, :t]

        conf = (
            np.stack([c[:t] for c in confs])
            if all(c is not None for c in confs)
            else None
        )

        if self.normalize_scene:
            from mvtracker_tpu.datasets.datapoint import transform_scene

            s, r, tr = estimate_scene_normalization(depth, intrs, extrs)
            depth, extrs, _, _, _ = transform_scene(s, r, tr, depth=depth, extrs=extrs)

        return Datapoint(
            video=video,
            videodepth=depth,
            videodepthconf=conf,
            intrs=intrs,
            extrs=extrs,
            seq_name=self.seq_names[index],
        )


def align_estimated_cameras_to_gt(
    est_extrs: np.ndarray,  # [V, 3, 4] estimated (e.g. VGGT) world->cam
    gt_extrs: np.ndarray,  # [V, 3, 4] ground truth world->cam
) -> tuple[float, np.ndarray, np.ndarray]:
    """Umeyama sim3 between camera centers; the reference's 'vggt_aligned'
    path (`generic_scene_dataset.py:854-927`). Returns (s, R, t) mapping the
    estimated world into the GT world."""
    def centers(extrs):
        r = extrs[:, :, :3]
        t = extrs[:, :, 3]
        return -np.einsum("vij,vi->vj", r, t)  # -R^T t per camera

    return align_umeyama(centers(gt_extrs), centers(est_extrs))
