"""TAP-Vid 2D benchmark adapter (L4).

Re-design of reference `mvtracker/datasets/tap_vid_datasets.py:37-956`:
loads TAP-Vid pickles (DAVIS et al.), samples queries in "first" or
"strided" mode, and optionally lifts the 2D benchmark into the multi-view
3D API by pairing it with a (mono-estimated or provided) depth stream and a
single identity camera — the reference does this with ZoeDepth/MoGe/MegaSAM
(`tap_vid_datasets.py:709-956`); here depth lifting consumes precomputed
depth files (the estimation networks are external and stay host-side
optional extras).
"""

from __future__ import annotations

import os
import pickle
from typing import Mapping, Optional

import numpy as np

from mvtracker_tpu.datasets.datapoint import Datapoint


def sample_queries_first(
    target_occluded: np.ndarray,  # [N, T] True = occluded
    target_points: np.ndarray,  # [N, T, 2] (x, y)
    frames: np.ndarray,  # [T, H, W, 3]
) -> Mapping[str, np.ndarray]:
    """First-visible-frame queries; mirrors reference
    `tap_vid_datasets.py:37-77` (query format [t, x, y])."""
    valid = np.sum(~target_occluded, axis=1) > 0
    target_points = target_points[valid]
    target_occluded = target_occluded[valid]

    queries = []
    for i in range(target_points.shape[0]):
        index = np.where(~target_occluded[i])[0][0]
        x, y = target_points[i, index]
        queries.append([index, x, y])
    return {
        "video": frames[None],
        "query_points": np.asarray(queries, np.float32)[None],
        "target_points": target_points[None],
        "occluded": target_occluded[None],
    }


def sample_queries_strided(
    target_occluded: np.ndarray,
    target_points: np.ndarray,
    frames: np.ndarray,
    query_stride: int = 5,
) -> Mapping[str, np.ndarray]:
    """Strided queries; mirrors reference `tap_vid_datasets.py:80-142`
    (note the reference emits [t, y, x] in this mode — kept verbatim)."""
    tracks, occs, queries, trackgroups = [], [], [], []
    trackgroup = np.arange(target_occluded.shape[0])
    for i in range(0, target_occluded.shape[1], query_stride):
        mask = ~target_occluded[:, i]
        query = np.stack(
            [
                i * np.ones(target_occluded.shape[0]),
                target_points[:, i, 1],
                target_points[:, i, 0],
            ],
            axis=-1,
        )
        queries.append(query[mask])
        tracks.append(target_points[mask])
        occs.append(target_occluded[mask])
        trackgroups.append(trackgroup[mask])
    return {
        "video": frames[None],
        "query_points": np.concatenate(queries)[None].astype(np.float32),
        "target_points": np.concatenate(tracks)[None],
        "occluded": np.concatenate(occs)[None],
        "trackgroup": np.concatenate(trackgroups)[None],
    }


class TapVidDataset:
    """TAP-Vid pickle loader (`tapvid_davis.pkl` layout: dict or list of
    {video [T,H,W,3] uint8 or jpeg bytes, points [N,T,2] in [0,1],
    occluded [N,T]}); mirrors reference `tap_vid_datasets.py:143-400`."""

    def __init__(
        self,
        pickle_path: str,
        query_mode: str = "first",
        depth_root: Optional[str] = None,
    ):
        self.query_mode = query_mode
        self.depth_root = depth_root
        with open(pickle_path, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, dict):
            self.names = sorted(data.keys())
            self.data = data
        else:
            self.names = [str(i) for i in range(len(data))]
            self.data = {str(i): d for i, d in enumerate(data)}

    def __len__(self):
        return len(self.names)

    def _decode_video(self, video) -> np.ndarray:
        if isinstance(video, np.ndarray) and video.ndim == 4:
            return video
        import imageio.v3 as iio

        return np.stack([np.asarray(iio.imread(frame)) for frame in video])

    def __getitem__(self, index: int) -> Datapoint:
        name = self.names[index]
        d = self.data[name]
        video = self._decode_video(d["video"]).astype(np.float32)  # [T, H, W, 3]
        t, h, w, _ = video.shape
        points = np.asarray(d["points"], np.float32)  # [N, T, 2] in [0, 1]
        occluded = np.asarray(d["occluded"], bool)  # [N, T]

        # Scale normalized coords to pixels (reference :300-340).
        pix = points * np.asarray([w, h], np.float32)[None, None]

        if self.query_mode == "first":
            sample = sample_queries_first(occluded, pix, video)
        else:
            sample = sample_queries_strided(occluded, pix, video)

        tracks_2d = sample["target_points"][0].transpose(1, 0, 2)  # [T, N, 2]
        occ = sample["occluded"][0].T  # [T, N]
        queries = sample["query_points"][0]  # [N, 3]
        n = queries.shape[0]

        # Depth: precomputed per-frame npy/npz if provided, else unit depth
        # (2D-only evaluation path).
        if self.depth_root is not None:
            dpath = os.path.join(self.depth_root, f"{name}.npy")
            depth = np.load(dpath).astype(np.float32)
        else:
            depth = np.ones((t, h, w), np.float32)

        # Identity camera: world == camera, pixel-space 3D.
        intrs = np.tile(np.eye(3, dtype=np.float32), (1, t, 1, 1))
        extrs = np.tile(np.eye(4, dtype=np.float32)[:3], (1, t, 1, 1))

        # Lift GT 2D tracks through depth to "3D" (z from depth map).
        zz = np.ones((t, n), np.float32)
        ti = np.arange(t)[:, None]
        xi = np.clip(np.round(tracks_2d[..., 0]).astype(int), 0, w - 1)
        yi = np.clip(np.round(tracks_2d[..., 1]).astype(int), 0, h - 1)
        zz = depth[ti, yi, xi]
        traj3d = np.concatenate(
            [tracks_2d * zz[..., None], zz[..., None]], axis=-1
        )  # pinhole with K=I: x_pix * z, y_pix * z, z

        if self.query_mode == "first":
            qt = queries[:, 0]
            qxy = queries[:, 1:3]
        else:  # strided stores [t, y, x]
            qt = queries[:, 0]
            qxy = queries[:, [2, 1]]
        qz = depth[
            qt.astype(int),
            np.clip(np.round(qxy[:, 1]).astype(int), 0, h - 1),
            np.clip(np.round(qxy[:, 0]).astype(int), 0, w - 1),
        ]
        query3d = np.concatenate(
            [qt[:, None], qxy * qz[:, None], qz[:, None]], axis=1
        ).astype(np.float32)

        return Datapoint(
            video=video[None],  # single "view"
            videodepth=depth[None],
            intrs=intrs,
            extrs=extrs,
            trajectory=np.concatenate([tracks_2d, zz[..., None]], -1)[None],
            visibility=(~occ)[None],
            trajectory_3d=traj3d.astype(np.float32),
            query_points_3d=query3d,
            valid=np.ones((t, n), bool),
            seq_name=f"tapvid_{name}",
        )
