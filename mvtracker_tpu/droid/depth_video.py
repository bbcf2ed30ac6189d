"""FFV1 lossless 16-bit depth video IO (L11).

Byte-compatible with the reference pipeline's `depth.mkv` artifacts
(`conversions/droid/training_data/extract_rgb_depth.py:217-312`): depth in
millimeters as uint16, split into the B (low byte) and G (high byte)
channels of an FFV1-coded BGR stream. Decoding:

    depth_meters = ((G << 8) | B) / 1000.0

This lets the framework consume depth videos already published by the
reference's DROID factory, and produce new ones it can read back.
"""

from __future__ import annotations

import json
import os

import numpy as np

DEPTH_SCALE_MM = 1000.0
DEPTH_MAX_MM = 65535


class FFV1DepthVideoWriter:
    """Mirrors reference `FFV1DepthVideoWriter` (`extract_rgb_depth.py:217-292`)."""

    def __init__(self, output_path: str, width: int, height: int, fps: float = 30.0):
        import cv2

        self.output_path = output_path
        self.width = width
        self.height = height
        self.fps = fps
        self.frame_count = 0
        fourcc = cv2.VideoWriter_fourcc(*"FFV1")
        self.writer = cv2.VideoWriter(
            output_path, fourcc, fps, (width, height), isColor=True
        )
        if not self.writer.isOpened():
            raise RuntimeError(f"failed to open FFV1 writer: {output_path}")

    def write_frame(self, depth_meters: np.ndarray):
        depth_mm = np.nan_to_num(
            depth_meters * DEPTH_SCALE_MM, nan=0.0, posinf=0.0, neginf=0.0
        )
        d16 = np.clip(depth_mm, 0, DEPTH_MAX_MM).astype(np.uint16)
        low = (d16 & 0xFF).astype(np.uint8)
        high = (d16 >> 8).astype(np.uint8)
        bgr = np.stack([low, high, np.zeros_like(low)], axis=-1)
        self.writer.write(bgr)
        self.frame_count += 1

    def close(self):
        if self.writer is not None:
            self.writer.release()
            self.writer = None

    def get_metadata(self) -> dict:
        return {
            "format": "ffv1_depth_z16",
            "encoding": "bgr_split_uint16",
            "channel_layout": {"B": "low_byte", "G": "high_byte", "R": "unused"},
            "depth_scale": DEPTH_SCALE_MM,
            "depth_unit": "millimeters",
            "depth_max_mm": DEPTH_MAX_MM,
            "width": self.width,
            "height": self.height,
            "fps": self.fps,
            "frame_count": self.frame_count,
            "decode_formula": "depth_meters = ((G << 8) | B) / 1000.0",
        }

    def save_metadata(self, path: str | None = None):
        path = path or self.output_path + ".json"
        with open(path, "w") as f:
            json.dump(self.get_metadata(), f, indent=2)


def decode_depth_frame(bgr_frame: np.ndarray) -> np.ndarray:
    """BGR uint8 frame -> depth meters; mirrors reference
    `decode_ffv1_depth_frame` (`extract_rgb_depth.py:293-312`)."""
    low = bgr_frame[:, :, 0].astype(np.uint16)
    high = bgr_frame[:, :, 1].astype(np.uint16)
    return ((high << 8) | low).astype(np.float32) / DEPTH_SCALE_MM


def read_depth_video(path: str, max_frames: int | None = None) -> np.ndarray:
    """Decode a full depth.mkv into [T, H, W] float32 meters."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise RuntimeError(f"failed to open depth video: {path}")
    frames = []
    while True:
        if max_frames is not None and len(frames) >= max_frames:
            break
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(decode_depth_frame(frame))
    cap.release()
    return np.stack(frames) if frames else np.zeros((0, 0, 0), np.float32)


def write_depth_video(path: str, depth: np.ndarray, fps: float = 30.0):
    """[T, H, W] float32 meters -> depth.mkv + sidecar metadata json."""
    t, h, w = depth.shape
    writer = FFV1DepthVideoWriter(path, w, h, fps)
    for i in range(t):
        writer.write_frame(depth[i])
    writer.close()
    writer.save_metadata()
