"""Native C++ kernel tests: build, numerics vs numpy, and throughput sanity."""

import numpy as np
import pytest

from mvtracker_tpu import native
from mvtracker_tpu.datasets.datapoint import _bilinear_upsample_ac, _gaussian_blur


def test_native_builds():
    assert native.available(), "native library failed to build"


def test_blur_matches_numpy(rng):
    x = rng.normal(size=(3, 24, 32)).astype(np.float32)
    ours = native.gaussian_blur(x, 7, 2.0)
    ref = _gaussian_blur(x, 7, 2.0)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_nearest_resize_matches_numpy(rng):
    x = rng.normal(size=(2, 16, 20, 3)).astype(np.float32)
    out = native.nearest_resize(x, 8, 10)
    ri = (np.arange(8) * 16 // 8)
    ci = (np.arange(10) * 20 // 10)
    expect = x[:, ri[:, None], ci[None, :], :]
    np.testing.assert_allclose(out, expect, atol=1e-6)


def test_bilinear_resize_matches_numpy(rng):
    x = rng.normal(size=(2, 8, 8, 2)).astype(np.float32)
    out = native.bilinear_resize_ac(x, 16, 16)
    ref = _bilinear_upsample_ac(x.transpose(0, 3, 1, 2), 16, 16).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(out, ref, atol=1e-4)


def test_normalize_rgb(rng):
    x = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    out = native.normalize_rgb(x)
    np.testing.assert_allclose(out, 2 * (x / 255.0) - 1, atol=1e-6)


def test_depth_invalid_fraction():
    d = np.ones((10, 10), np.float32)
    d[:5] = 0
    assert native.depth_invalid_fraction(d) == pytest.approx(0.5)
