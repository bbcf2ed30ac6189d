"""ctypes bindings for the native data-pipeline kernels (native/datapath.cpp).

Builds the shared library on demand (g++ is baked into the image) and falls
back to numpy implementations when compilation is unavailable. All entry
points take/return numpy arrays and are GIL-free inside the native code, so
loader threads genuinely parallelize.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdatapath.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(
                os.path.join(_NATIVE_DIR, "datapath.cpp")
            ):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
                )
            lib = ctypes.CDLL(_LIB_PATH)
            i64 = ctypes.c_int64
            fp = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            lib.gaussian_blur_f32.argtypes = [fp, i64, i64, i64, ctypes.c_int, ctypes.c_float]
            lib.nearest_resize_f32.argtypes = [fp, fp, i64, i64, i64, i64, i64, i64]
            lib.bilinear_resize_ac_f32.argtypes = [fp, fp, i64, i64, i64, i64, i64, i64]
            lib.normalize_rgb_u8_f32.argtypes = [u8p, fp, i64]
            lib.photometric_jitter_f32.argtypes = [fp, i64, i64, fp, fp, fp, fp]
            lib.depth_invalid_fraction_f32.argtypes = [fp, i64]
            lib.depth_invalid_fraction_f32.restype = ctypes.c_double
            _lib = lib
        except Exception as e:  # pragma: no cover
            logging.warning("native datapath unavailable (%s); using numpy fallbacks", e)
            _lib = None
        return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return _load() is not None


def gaussian_blur(x: np.ndarray, kernel: int = 7, sigma: float = 2.0) -> np.ndarray:
    """Separable reflect-padded blur over the last two axes; float32 copy."""
    lib = _load()
    shape = x.shape
    out = np.ascontiguousarray(x, np.float32).reshape(-1, shape[-2], shape[-1]).copy()
    if lib is not None:
        lib.gaussian_blur_f32(
            _fptr(out), out.shape[0], out.shape[1], out.shape[2], kernel, sigma
        )
        return out.reshape(shape)
    from mvtracker_tpu.datasets.datapoint import _gaussian_blur

    return _gaussian_blur(np.asarray(x, np.float32), kernel, sigma).astype(np.float32)


def nearest_resize(x: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """[..., H, W, C] nearest resize (torch 'nearest' semantics)."""
    lib = _load()
    *lead, h, w, c = x.shape
    n = int(np.prod(lead)) if lead else 1
    src = np.ascontiguousarray(x, np.float32).reshape(n, h, w, c)
    if lib is not None:
        dst = np.empty((n, oh, ow, c), np.float32)
        lib.nearest_resize_f32(_fptr(src), _fptr(dst), n, h, w, c, oh, ow)
        return dst.reshape(*lead, oh, ow, c)
    ri = (np.arange(oh) * h // oh).astype(np.int64)
    ci = (np.arange(ow) * w // ow).astype(np.int64)
    return src[:, ri[:, None], ci[None, :], :].reshape(*lead, oh, ow, c)


def bilinear_resize_ac(x: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """[..., H, W, C] bilinear align-corners resize."""
    lib = _load()
    *lead, h, w, c = x.shape
    n = int(np.prod(lead)) if lead else 1
    src = np.ascontiguousarray(x, np.float32).reshape(n, h, w, c)
    if lib is not None:
        dst = np.empty((n, oh, ow, c), np.float32)
        lib.bilinear_resize_ac_f32(_fptr(src), _fptr(dst), n, h, w, c, oh, ow)
        return dst.reshape(*lead, oh, ow, c)
    from mvtracker_tpu.datasets.datapoint import _bilinear_upsample_ac

    r = _bilinear_upsample_ac(src.transpose(0, 3, 1, 2), oh, ow)
    return r.transpose(0, 2, 3, 1).reshape(*lead, oh, ow, c).astype(np.float32)


def normalize_rgb(x: np.ndarray) -> np.ndarray:
    """uint8 [..., 3] -> float32 2*(x/255)-1."""
    lib = _load()
    src = np.ascontiguousarray(x, np.uint8)
    if lib is not None:
        dst = np.empty(src.shape, np.float32)
        lib.normalize_rgb_u8_f32(
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), _fptr(dst), src.size
        )
        return dst
    return 2.0 * (src.astype(np.float32) / 255.0) - 1.0


def photometric_jitter(
    x: np.ndarray,  # [N, H, W, 3] float32, modified semantics-equal copy out
    mean: np.ndarray,  # [N] per-image (or per-group, replicated) mean
    brightness: np.ndarray,  # [N]
    contrast: np.ndarray,  # [N]
    saturation: np.ndarray,  # [N]
) -> np.ndarray:
    """Contrast/saturation/brightness jitter; exact match of the numpy path
    in `datasets/augmentations.py::photometric_augment` (mean is supplied by
    the caller so per-GROUP means survive the per-image kernel layout)."""
    lib = _load()
    n, h, w, _ = x.shape
    out = np.ascontiguousarray(x, np.float32).copy()
    if lib is not None:
        lib.photometric_jitter_f32(
            _fptr(out), n, h * w,
            _fptr(np.ascontiguousarray(mean, np.float32)),
            _fptr(np.ascontiguousarray(brightness, np.float32)),
            _fptr(np.ascontiguousarray(contrast, np.float32)),
            _fptr(np.ascontiguousarray(saturation, np.float32)),
        )
        return out
    m = mean.reshape(n, 1, 1, 1).astype(np.float32)
    xc = (out - m) * contrast.reshape(n, 1, 1, 1) + m
    gray = xc.mean(axis=-1, keepdims=True)
    return (
        (xc - gray) * saturation.reshape(n, 1, 1, 1) + gray
    ) * brightness.reshape(n, 1, 1, 1)


def depth_invalid_fraction(depth: np.ndarray) -> float:
    lib = _load()
    d = np.ascontiguousarray(depth, np.float32)
    if lib is not None:
        return float(lib.depth_invalid_fraction_f32(_fptr(d), d.size))
    return float((d == 0).mean())
