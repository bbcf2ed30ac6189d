"""Depth fusion: static-prefix calibration + residual-weighted blending."""

import numpy as np

from mvtracker_tpu.utils.depth_fusion import (
    detect_static_prefix_frames,
    estimate_per_view_scale,
    fuse_depths,
)


def _scene(rng, v=2, t=6, h=24, w=32):
    # Smooth depth surface (real depth is locally smooth; the fusion's 3x3
    # weighted smoothing assumes as much).
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
    base = 2.0 + np.sin(2 * np.pi * xx) * 0.5 + yy * 1.0
    gt = np.broadcast_to(base, (v, t, h, w)).astype(np.float32).copy()
    gt += rng.uniform(0, 0.5, size=(v, 1, 1, 1)).astype(np.float32)
    rgbs = np.zeros((v, t, h, w, 3), np.float32)
    rgbs[:, 3:] = 200.0  # motion starts at frame 3 -> static prefix {0,1,2}
    return gt, rgbs


def test_static_prefix_detection(rng):
    _, rgbs = _scene(rng)
    assert detect_static_prefix_frames(rgbs) == [0, 1, 2]
    # fully static clip capped at max_frames
    static = np.zeros((1, 20, 8, 8, 3), np.float32)
    assert len(detect_static_prefix_frames(static)) == 10


def test_scale_calibration_recovers_scale(rng):
    gt, _ = _scene(rng)
    pred = gt / 2.5  # estimator off by a global scale
    s = estimate_per_view_scale(pred, gt, [0, 1, 2])
    np.testing.assert_allclose(s.ravel(), 2.5, rtol=1e-5)


def test_fusion_beats_each_input(rng):
    gt, rgbs = _scene(rng)
    true = gt.copy()
    # Sensor depth: valid but with holes (0) and mild noise.
    sensor = true + rng.normal(0, 0.01, true.shape).astype(np.float32)
    sensor[rng.random(sensor.shape) < 0.2] = 0.0
    # Estimate: wrong global scale + heavier noise + some outliers.
    est = true / 1.7 + rng.normal(0, 0.03, true.shape).astype(np.float32) / 1.7
    est[rng.random(est.shape) < 0.02] *= 5.0

    fused, conf = fuse_depths(sensor, [(est, None)], rgbs)
    assert fused.shape == true.shape and conf.shape == true.shape
    assert np.isfinite(fused).all() and (conf >= 0).all()

    err_fused = np.abs(fused - true).mean()
    # Holes in the sensor are filled from the calibrated estimate.
    holes = sensor == 0
    err_fused_holes = np.abs(fused - true)[holes].mean()
    assert err_fused_holes < 0.2, err_fused_holes
    # Overall fused error is small (scale was recovered from the prefix)
    # and beats the raw calibrated estimate (sensor pixels anchor it).
    err_est = np.abs(est * 1.7 - true).mean()
    assert err_fused < 0.08, err_fused
    assert err_fused < err_est, (err_fused, err_est)


def test_fusion_masks_nonfinite_estimate(rng):
    """NaN/Inf pixels in an external depth estimate get zero weight and must
    not leak into the fused result (directly or via the 3x3 smoothing)."""
    gt, rgbs = _scene(rng)
    est = gt / 2.0
    est[:, :, ::3, ::3] = np.nan
    est[:, :, 1::3, 1::3] = np.inf
    fused, conf = fuse_depths(gt, [(est, None)], rgbs)
    assert np.isfinite(fused).all() and np.isfinite(conf).all()
    np.testing.assert_allclose(
        fused[:, :, 1:-1, 1:-1], gt[:, :, 1:-1, 1:-1], atol=0.05
    )


def test_fusion_masked_estimate_keeps_sensor_weight(rng):
    """A masked estimate pixel over VALID sensor depth must not collapse the
    sensor's weight (the zeroed placeholder would otherwise enter the joint
    residual as |0 - gt|): with a sharp depth edge under an all-NaN estimate
    region, the fused output must keep the sensor's edge, not blur it."""
    gt, rgbs = _scene(rng)
    # Sharp step edge in the sensor depth.
    gt = gt.copy()
    gt[:, :, :, 16:] += 3.0
    est = gt / 2.0
    est[:, :, 8:24, 8:24] = np.nan  # estimate fails across the edge
    fused, _ = fuse_depths(gt, [(est, None)], rgbs)
    # Inside the masked block, away from its border and away from the edge
    # itself (the 3x3 smoothing legitimately blurs the one-pixel edge
    # neighborhood, exactly as in the reference), the sensor must survive.
    np.testing.assert_allclose(
        fused[:, :, 10:22, 10:14], gt[:, :, 10:22, 10:14], atol=0.05
    )
    np.testing.assert_allclose(
        fused[:, :, 10:22, 19:22], gt[:, :, 10:22, 19:22], atol=0.05
    )


def test_fusion_no_estimates_returns_sensor_like(rng):
    gt, rgbs = _scene(rng)
    fused, conf = fuse_depths(gt, [], rgbs)
    # fused == weighted-3x3-smoothed gt; smooth surface -> tiny deviation in
    # the interior (borders see asymmetric zero-padded windows, allow more)
    np.testing.assert_allclose(fused[:, :, 1:-1, 1:-1], gt[:, :, 1:-1, 1:-1], atol=0.02)
    np.testing.assert_allclose(fused, gt, atol=0.15)
