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


def test_photometric_jitter_native_matches_numpy(rng):
    """The C jitter kernel must equal the numpy fallback (and therefore the
    augmentation's documented semantics) bit-for-bit-ish."""
    from mvtracker_tpu import native

    x = rng.uniform(0, 255, size=(3, 16, 20, 3)).astype(np.float32)
    mean = np.full(3, x.mean(), np.float32)
    b = np.asarray([1.1, 0.9, 1.0], np.float32)
    c = np.asarray([0.8, 1.2, 1.0], np.float32)
    s = np.asarray([1.3, 0.7, 1.0], np.float32)
    got = native.photometric_jitter(x, mean, b, c, s)

    m = mean.reshape(-1, 1, 1, 1)
    xc = (x - m) * c.reshape(-1, 1, 1, 1) + m
    gray = xc.mean(axis=-1, keepdims=True)
    want = ((xc - gray) * s.reshape(-1, 1, 1, 1) + gray) * b.reshape(-1, 1, 1, 1)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_gaussian_blur_tiny_image_no_oob(rng):
    """kernel/2 >= image size: the reflect must clamp, not read out of
    bounds (heap overread pre-fix)."""
    from mvtracker_tpu import native

    x = rng.uniform(0, 1, size=(2, 3, 3)).astype(np.float32)
    out = native.gaussian_blur(x, kernel=7, sigma=2.0)
    assert out.shape == x.shape
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1.0 + 1e-5


def test_photometric_augment_uses_native_path(rng):
    """The augmentation pipeline runs through the native wrappers without
    changing its semantics (group mean, per-pixel gray)."""
    from mvtracker_tpu.datasets import synthetic
    from mvtracker_tpu.datasets.augmentations import photometric_augment

    dp = synthetic.render_scene(seed=0, n_views=2, n_frames=2, height=24, width=24, n_tracks=4)
    out = photometric_augment(dp, np.random.default_rng(0))
    assert out.video.shape == dp.video.shape
    assert np.isfinite(out.video).all()
    assert 0 <= out.video.min() and out.video.max() <= 255
    assert not np.allclose(out.video, dp.video)  # jitter actually applied
