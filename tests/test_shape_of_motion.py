"""Tests for the Shape-of-Motion optimization baseline
(models/shape_of_motion.py) — SE(3) motion-basis gaussians, TPU-native
equivalent of reference flow3d (shape-of-motion)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.models import shape_of_motion as som
from mvtracker_tpu.ops import gsplat


def _quat_about_z(theta):
    return np.array([np.cos(theta / 2), 0.0, 0.0, np.sin(theta / 2)], np.float32)


class TestMotionBases:
    def test_identity_bases_are_identity_transforms(self):
        k, t = 3, 5
        bases = som.MotionBases(
            rots=jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 0]), (k, t, 1)),
            transls=jnp.zeros((k, t, 3)),
        )
        coefs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(0), (7, k)))
        tf = som.compute_transforms(bases, jnp.arange(t), coefs)
        assert tf.shape == (7, t, 3, 4)
        np.testing.assert_allclose(
            np.asarray(tf[..., :3]), np.tile(np.eye(3), (7, t, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(tf[..., 3]), 0.0, atol=1e-6)

    def test_single_basis_translation_blend(self):
        # one basis translating +x linearly; coefs all on that basis
        t = 4
        transls = jnp.stack(
            [jnp.stack([jnp.arange(t, dtype=jnp.float32), jnp.zeros(t), jnp.zeros(t)], -1)]
        )  # [1, T, 3]
        bases = som.MotionBases(
            rots=jnp.tile(jnp.array([1.0, 0, 0, 0, 1, 0]), (1, t, 1)), transls=transls
        )
        tf = som.compute_transforms(bases, jnp.arange(t), jnp.ones((2, 1)))
        np.testing.assert_allclose(
            np.asarray(tf[0, :, 0, 3]), np.arange(t, dtype=np.float32), atol=1e-6
        )

    def test_rotmat_to_quat_roundtrip(self):
        q = jax.random.normal(jax.random.PRNGKey(1), (64, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        r = gsplat.quat_to_rotmat(q)
        q2 = som._rotmat_to_quat(r)
        r2 = gsplat.quat_to_rotmat(q2)
        np.testing.assert_allclose(np.asarray(r), np.asarray(r2), atol=1e-4)


class TestPoses:
    def _params(self, n_fg=6, n_bg=4, t=5, k=2, seed=0):
        rng = np.random.default_rng(seed)
        return som.init_params(
            rng.normal(size=(n_fg, 3)).astype(np.float32),
            rng.uniform(size=(n_fg, 3)).astype(np.float32),
            rng.normal(size=(n_bg, 3)).astype(np.float32),
            rng.uniform(size=(n_bg, 3)).astype(np.float32),
            t,
            som.SOMConfig(num_bases=k),
            seed,
        )

    def test_init_poses_are_canonical(self):
        p = self._params()
        means, quats = som.fg_poses_at(p, jnp.arange(5))
        np.testing.assert_allclose(
            np.asarray(means), np.tile(np.asarray(p.fg_means)[:, None], (1, 5, 1)), atol=1e-5
        )

    def test_coef_softmax_normalized(self):
        p = self._params()
        w = som._coef_weights(p.motion_coefs)
        np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=1e-6)


class TestTrackPoints:
    def test_rigid_translation_tracked_exactly(self):
        """One basis translating +x; every query must move identically."""
        t = 4
        rng = np.random.default_rng(0)
        fg = rng.normal(size=(32, 3)).astype(np.float32) * 0.2
        p = som.init_params(
            fg, rng.uniform(size=(32, 3)).astype(np.float32),
            rng.normal(size=(8, 3)).astype(np.float32) + 5,
            rng.uniform(size=(8, 3)).astype(np.float32),
            t, som.SOMConfig(num_bases=2), 0,
        )
        # overwrite: basis 0 translates 0.1*t in +x, coefs hard on basis 0
        transls = np.zeros((2, t, 3), np.float32)
        transls[0, :, 0] = 0.1 * np.arange(t)
        p = p._replace(
            motion_transls=jnp.asarray(transls),
            motion_coefs=jnp.asarray(
                np.tile([50.0, -50.0], (32, 1)).astype(np.float32)
            ),
        )
        q = jnp.asarray(fg[:3] + 0.01)
        out = som.track_points(p, q, jnp.zeros(3, jnp.int32), jnp.arange(t), topk=4)
        assert out.shape == (3, t, 3)
        for i in range(3):
            np.testing.assert_allclose(
                np.asarray(out[i, :, 0]) - float(q[i, 0]),
                0.1 * np.arange(t),
                atol=1e-3,
            )
            np.testing.assert_allclose(np.asarray(out[i, :, 1]), float(q[i, 1]), atol=1e-3)

    def test_rotation_basis_rotates_offsets(self):
        """A basis rotating about z must rotate query offsets rigidly."""
        t = 2
        theta = 0.3
        rot6d = np.tile([1, 0, 0, 0, 1, 0], (1, t, 1)).astype(np.float32)
        c, s = np.cos(theta), np.sin(theta)
        # cont-6d of Rz(theta): first two columns of the rotation matrix
        rot6d[0, 1] = [c, s, 0, -s, c, 0]
        fg = np.array([[1.0, 0, 0], [0.9, 0.1, 0], [1.1, -0.1, 0]], np.float32)
        p = som.init_params(
            fg, np.ones((3, 3), np.float32) * 0.5,
            np.ones((2, 3), np.float32) * 5, np.ones((2, 3), np.float32) * 0.5,
            t, som.SOMConfig(num_bases=1), 0,
        )
        p = p._replace(motion_rots=jnp.asarray(rot6d))
        q = jnp.asarray([[1.0, 0.0, 0.0]])
        out = som.track_points(p, q, jnp.zeros(1, jnp.int32), jnp.arange(t), topk=2)
        expect = np.array([c * 1.0, s * 1.0, 0.0])
        np.testing.assert_allclose(np.asarray(out[0, 1]), expect, atol=1e-2)


class TestFit:
    @pytest.mark.slow
    def test_fit_recovers_translation_with_track_supervision(self):
        """Scene: fg square translating +x, static bg; fit with rgb + track
        supervision; extracted tracks must follow the motion."""
        rng = np.random.default_rng(0)
        t_total, v, h, w = 4, 2, 32, 32
        n_fg, n_bg = 24, 24
        fg0 = np.stack(
            [rng.uniform(-0.3, 0.3, n_fg), rng.uniform(-0.3, 0.3, n_fg), np.full(n_fg, 2.0)],
            -1,
        ).astype(np.float32)
        bg = np.stack(
            [rng.uniform(-1.2, 1.2, n_bg), rng.uniform(-1.2, 1.2, n_bg), np.full(n_bg, 4.0)],
            -1,
        ).astype(np.float32)
        fg_rgb = np.tile([0.9, 0.3, 0.2], (n_fg, 1)).astype(np.float32)
        bg_rgb = np.tile([0.2, 0.3, 0.9], (n_bg, 1)).astype(np.float32)

        f = 40.0
        intrs = np.tile(
            np.array([[f, 0, (w - 1) / 2], [0, f, (h - 1) / 2], [0, 0, 1.0]], np.float32),
            (v, 1, 1),
        )
        w2cs = np.zeros((v, 3, 4), np.float32)
        for vi in range(v):
            w2cs[vi, :3, :3] = np.eye(3)
            w2cs[vi, 0, 3] = 0.3 * vi

        dx = 0.12
        video = np.zeros((v, t_total, h, w, 3), np.float32)
        mask = np.zeros((v, t_total, h, w), np.float32)
        tracks3d = np.zeros((n_fg, t_total, 3), np.float32)
        n_all = n_fg + n_bg
        for t in range(t_total):
            fg_t = fg0 + [dx * t, 0, 0]
            tracks3d[:, t] = fg_t
            xyz = np.concatenate([fg_t, bg])
            attrs = np.concatenate(
                [np.concatenate([fg_rgb, bg_rgb]),
                 np.concatenate([np.ones((n_fg, 1)), np.zeros((n_bg, 1))])], -1
            )
            for vi in range(v):
                out = gsplat.render_gaussians(
                    jnp.asarray(xyz),
                    jnp.tile(jnp.array([1.0, 0, 0, 0]), (n_all, 1)),
                    jnp.full((n_all, 3), np.log(0.06)),
                    jnp.full((n_all,), 6.0),
                    jnp.asarray(attrs),
                    jnp.asarray(intrs[vi]), jnp.asarray(w2cs[vi]), (w, h),
                )
                video[vi, t] = np.asarray(out.rgb[..., :3])
                mask[vi, t] = np.asarray(out.rgb[..., 3])

        cfg = som.SOMConfig(
            num_bases=3, iters=300, segment_iters=100,
            lr_motion_bases=5e-3, lr_means=1e-3, w_track=5.0, tracks_per_step=16,
        )
        params = som.fit_scene(
            video, intrs, w2cs, fg0, fg_rgb, bg, bg_rgb,
            mask=mask, tracks3d=tracks3d, cfg=cfg, chunk=64,
        )
        q = np.concatenate(
            [np.zeros((4, 1)), tracks3d[:4, 0]], axis=1
        ).astype(np.float32)
        tracks, vis = som.extract_tracks(params, q, t_total)
        assert tracks.shape == (t_total, 4, 3)
        moved = tracks[-1, :, 0] - tracks[0, :, 0]
        # true displacement is 0.36 over 3 frames
        assert np.all(moved > 0.15), f"tracks did not follow fg motion: {moved}"

    def test_fit_segment_smoke_rgb_only(self):
        """fit_segment runs and decreases loss with rgb-only supervision."""
        rng = np.random.default_rng(1)
        t_total, h, w = 2, 24, 24
        fg = rng.normal(size=(8, 3)).astype(np.float32) * 0.2 + [0, 0, 2]
        bg = rng.normal(size=(8, 3)).astype(np.float32) * 0.5 + [0, 0, 4]
        cfg = som.SOMConfig(num_bases=2, iters=40, segment_iters=20)
        params = som.init_params(
            fg, rng.uniform(size=(8, 3)).astype(np.float32),
            bg, rng.uniform(size=(8, 3)).astype(np.float32), t_total, cfg,
        )
        intr = np.array([[30.0, 0, 11.5], [0, 30.0, 11.5], [0, 0, 1]], np.float32)
        w2c = np.concatenate([np.eye(3), np.zeros((3, 1))], 1).astype(np.float32)
        video = rng.uniform(size=(1, t_total, h, w, 3)).astype(np.float32)
        data = {
            "video": jnp.asarray(video),
            "intrs": jnp.asarray(intr)[None],
            "w2cs": jnp.asarray(w2c)[None],
        }
        opt = som.adam_init(params)
        p2, opt2, losses = som.fit_segment(
            params, opt, data, jax.random.PRNGKey(0), cfg, (w, h), 20, 64
        )
        assert np.isfinite(np.asarray(losses)).all()
        # params actually moved
        assert float(jnp.abs(p2.fg_colors - params.fg_colors).max()) > 0
