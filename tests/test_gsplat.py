"""Tests for the TPU-native differentiable gaussian rasterizer
(`ops/gsplat.py`), the foundation of the Dynamic3DGS and Shape-of-Motion
optimization baselines (reference uses CUDA diff-gaussian-rasterization /
gsplat; we re-derive the math and check it analytically)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.ops import gsplat


def _camera(w=64, h=48, f=60.0, z_off=4.0):
    intr = jnp.array([[f, 0.0, (w - 1) / 2], [0.0, f, (h - 1) / 2], [0.0, 0.0, 1.0]])
    w2c = jnp.concatenate([jnp.eye(3), jnp.array([[0.0], [0.0], [z_off]])], axis=1)
    return intr, w2c, (w, h)


def _single_gaussian(xyz=(0.0, 0.0, 0.0), scale=0.15, opacity=8.0, color=(1.0, 0.0, 0.0)):
    return dict(
        means3d=jnp.array([xyz]),
        quats=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        log_scales=jnp.full((1, 3), jnp.log(scale)),
        logit_opacities=jnp.array([opacity]),
        colors=jnp.array([color]),
    )


class TestQuatMath:
    def test_rotmat_orthonormal(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
        r = gsplat.quat_to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), 1.0, atol=1e-5)

    def test_quat_multiply_matches_rotmat_product(self):
        key = jax.random.PRNGKey(1)
        a = jax.random.normal(key, (8, 4))
        b = jax.random.normal(jax.random.PRNGKey(2), (8, 4))
        a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
        b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
        lhs = gsplat.quat_to_rotmat(gsplat.quat_multiply(a, b))
        rhs = gsplat.quat_to_rotmat(a) @ gsplat.quat_to_rotmat(b)
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_cont6d_roundtrip(self):
        q = jax.random.normal(jax.random.PRNGKey(3), (16, 4))
        r = gsplat.quat_to_rotmat(q)
        r2 = gsplat.cont6d_to_rotmat(gsplat.rotmat_to_cont6d(r))
        np.testing.assert_allclose(r, r2, atol=1e-5)


class TestRenderer:
    def test_splat_lands_at_projection(self):
        intr, w2c, wh = _camera()
        g = _single_gaussian(xyz=(0.2, -0.1, 0.0))
        out = gsplat.render_gaussians(**g, intr=intr, w2c=w2c, img_wh=wh)
        # Analytic projection of the center.
        x = 60.0 * 0.2 / 4.0 + (64 - 1) / 2
        y = 60.0 * (-0.1) / 4.0 + (48 - 1) / 2
        alpha = np.asarray(out.alpha)
        iy, ix = np.unravel_index(np.argmax(alpha), alpha.shape)
        assert abs(ix - x) <= 1 and abs(iy - y) <= 1
        # Red gaussian on black background.
        rgb = np.asarray(out.rgb)
        assert rgb[iy, ix, 0] > 0.9 and rgb[iy, ix, 1] < 1e-3

    def test_depth_is_camera_z(self):
        intr, w2c, wh = _camera(z_off=4.0)
        g = _single_gaussian(scale=0.1, opacity=20.0)
        out = gsplat.render_gaussians(**g, intr=intr, w2c=w2c, img_wh=wh)
        cy, cx = (48 - 1) // 2, (64 - 1) // 2
        d = float(out.depth[cy, cx]) / max(float(out.alpha[cy, cx]), 1e-6)
        assert abs(d - 4.0) < 1e-2

    def test_front_to_back_occlusion(self):
        intr, w2c, wh = _camera()
        # Opaque red in front of opaque green, same line of sight.
        params = dict(
            means3d=jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 1.0]]),
            quats=jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1)),
            log_scales=jnp.full((2, 3), jnp.log(0.08)),
            logit_opacities=jnp.array([12.0, 12.0]),
            colors=jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        )
        out = gsplat.render_gaussians(**params, intr=intr, w2c=w2c, img_wh=wh)
        cy, cx = (48 - 1) // 2, (64 - 1) // 2
        assert float(out.rgb[cy, cx, 0]) > 0.85
        assert float(out.rgb[cy, cx, 1]) < 0.15
        # Swap order in memory: result must be identical (depth sort).
        out2 = gsplat.render_gaussians(
            **{
                k: v[::-1] if k != "quats" else v
                for k, v in params.items()
            },
            intr=intr,
            w2c=w2c,
            img_wh=wh,
        )
        np.testing.assert_allclose(out.rgb, out2.rgb, atol=1e-5)

    def test_chunked_matches_unchunked(self):
        key = jax.random.PRNGKey(0)
        n = 70  # deliberately not a multiple of the chunk size
        intr, w2c, wh = _camera()
        params = dict(
            means3d=jax.random.normal(key, (n, 3)) * 0.5,
            quats=jax.random.normal(jax.random.PRNGKey(1), (n, 4)),
            log_scales=jnp.log(0.05) + 0.3 * jax.random.normal(jax.random.PRNGKey(2), (n, 3)),
            logit_opacities=jax.random.normal(jax.random.PRNGKey(3), (n,)),
            colors=jax.random.uniform(jax.random.PRNGKey(4), (n, 3)),
        )
        a = gsplat.render_gaussians(**params, intr=intr, w2c=w2c, img_wh=wh, chunk=16)
        b = gsplat.render_reference(**params, intr=intr, w2c=w2c, img_wh=wh)
        np.testing.assert_allclose(a.rgb, b.rgb, atol=1e-5)
        np.testing.assert_allclose(a.alpha, b.alpha, atol=1e-5)

    def test_behind_camera_culled(self):
        intr, w2c, wh = _camera(z_off=4.0)
        g = _single_gaussian(xyz=(0.0, 0.0, -10.0))  # behind the camera
        out = gsplat.render_gaussians(**g, intr=intr, w2c=w2c, img_wh=wh)
        assert float(jnp.max(out.alpha)) == 0.0
        assert float(out.radii[0]) == 0.0

    def test_background_composited(self):
        intr, w2c, wh = _camera()
        g = _single_gaussian(xyz=(100.0, 100.0, 0.0))  # off screen
        out = gsplat.render_gaussians(
            **g, intr=intr, w2c=w2c, img_wh=wh, bg=jnp.array([0.2, 0.4, 0.6])
        )
        np.testing.assert_allclose(np.asarray(out.rgb)[0, 0], [0.2, 0.4, 0.6], atol=1e-5)

    def test_gradients_flow_to_all_params(self):
        intr, w2c, wh = _camera(w=32, h=24)
        target = jnp.zeros((24, 32, 3))

        def loss(params):
            out = gsplat.render_gaussians(**params, intr=intr, w2c=w2c, img_wh=wh, chunk=8)
            return jnp.mean((out.rgb - target) ** 2)

        g = _single_gaussian(scale=0.3, opacity=2.0)
        grads = jax.grad(loss)(g)
        for k, v in grads.items():
            assert np.all(np.isfinite(np.asarray(v))), k
        assert float(jnp.abs(grads["means3d"]).max()) > 0
        assert float(jnp.abs(grads["logit_opacities"]).max()) > 0
        assert float(jnp.abs(grads["log_scales"]).max()) > 0

    def test_anisotropic_rotation_changes_footprint(self):
        intr, w2c, wh = _camera()
        base = dict(
            means3d=jnp.zeros((1, 3)),
            log_scales=jnp.log(jnp.array([[0.5, 0.02, 0.02]])),
            logit_opacities=jnp.array([10.0]),
            colors=jnp.ones((1, 3)),
        )
        out_x = gsplat.render_gaussians(
            **base, quats=jnp.array([[1.0, 0.0, 0.0, 0.0]]), intr=intr, w2c=w2c, img_wh=wh
        )
        # rotate 90 deg about z: long axis moves from x to y
        s = float(np.sin(np.pi / 4))
        out_y = gsplat.render_gaussians(
            **base, quats=jnp.array([[s, 0.0, 0.0, s]]), intr=intr, w2c=w2c, img_wh=wh
        )
        ax = np.asarray(out_x.alpha) > 0.5
        ay = np.asarray(out_y.alpha) > 0.5
        cy, cx = (48 - 1) // 2, (64 - 1) // 2
        assert ax[cy].sum() > ax[:, cx].sum()  # wide in x
        assert ay[:, cx].sum() > ay[cy].sum()  # wide in y


class TestSSIM:
    def test_identical_images(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(gsplat.ssim(img, img)) == pytest.approx(1.0, abs=1e-4)

    def test_noise_lowers_ssim(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        noisy = img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), (32, 32, 3))
        assert float(gsplat.ssim(img, noisy)) < 0.8


class TestInfluence:
    def test_peak_at_center_and_scale_aware(self):
        means = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        quats = jnp.tile(jnp.array([[1.0, 0.0, 0.0, 0.0]]), (2, 1))
        log_scales = jnp.log(jnp.array([[0.1, 0.1, 0.1], [0.5, 0.5, 0.5]]))
        opac = jnp.array([5.0, 5.0])
        pts = jnp.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.5, 0.0, 0.0]])
        inf = gsplat.gaussian_influence(pts, means, quats, log_scales, opac)
        assert inf.shape == (3, 2)
        assert int(jnp.argmax(inf[0])) == 0
        assert int(jnp.argmax(inf[1])) == 1
        # Midpoint: the wider gaussian (index 1) dominates.
        assert int(jnp.argmax(inf[2])) == 1

    def test_matches_direct_covariance_inverse(self):
        key = jax.random.PRNGKey(5)
        means = jax.random.normal(key, (4, 3))
        quats = jax.random.normal(jax.random.PRNGKey(6), (4, 4))
        log_scales = 0.2 * jax.random.normal(jax.random.PRNGKey(7), (4, 3)) - 1.0
        opac = jax.random.normal(jax.random.PRNGKey(8), (4,))
        pts = jax.random.normal(jax.random.PRNGKey(9), (5, 3))
        inf = gsplat.gaussian_influence(pts, means, quats, log_scales, opac)
        # Direct: sigmoid(o) * exp(-0.5 d^T Sigma^-1 d), reference
        # track_3d.py::gaussian_influence formulation.
        cov = np.asarray(gsplat.build_cov3d(log_scales, quats))
        d = np.asarray(pts)[:, None] - np.asarray(means)[None]
        maha = np.einsum("mni,nij,mnj->mn", d, np.linalg.inv(cov), d)
        expected = jax.nn.sigmoid(opac)[None] * np.exp(-0.5 * maha)
        np.testing.assert_allclose(inf, expected, rtol=1e-4, atol=1e-6)
