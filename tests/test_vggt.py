"""Tests for the flax VGGT implementation (models/vggt.py) — alternating
frame/global attention aggregator, iterative camera head, DPT depth/point
heads (reference mvtracker/models/core/vggt/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.models import vggt


@pytest.fixture(scope="module")
def tiny_model_and_params():
    cfg = vggt.tiny_config()
    model = vggt.VGGT(cfg)
    images = jnp.zeros((1, 2, cfg.img_size, cfg.img_size, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images)
    return cfg, model, params


class TestRope:
    def test_zero_position_is_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 7, 16))
        pos = jnp.zeros((2, 7, 2), jnp.int32)
        np.testing.assert_allclose(
            np.asarray(vggt.apply_rope_2d(x, pos, 100.0)), np.asarray(x), atol=1e-6
        )

    def test_rotation_preserves_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 9, 32))
        pos = jax.random.randint(jax.random.PRNGKey(2), (1, 9, 2), 0, 10)
        y = vggt.apply_rope_2d(x, pos, 100.0)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(y), axis=-1),
            np.linalg.norm(np.asarray(x), axis=-1),
            rtol=1e-4,
        )

    def test_relative_position_invariance(self):
        """RoPE attention logits depend only on relative positions."""
        q = jax.random.normal(jax.random.PRNGKey(3), (1, 1, 1, 16))
        k = jax.random.normal(jax.random.PRNGKey(4), (1, 1, 1, 16))
        def logit(pq, pk):
            qr = vggt.apply_rope_2d(q, jnp.asarray(pq).reshape(1, 1, 2), 100.0)
            kr = vggt.apply_rope_2d(k, jnp.asarray(pk).reshape(1, 1, 2), 100.0)
            return float(jnp.sum(qr * kr))
        a = logit([2, 3], [5, 1])
        b = logit([12, 13], [15, 11])  # same offset (-3, +2)
        assert a == pytest.approx(b, abs=1e-4)


class TestAggregator:
    def test_output_shapes_and_intermediates(self, tiny_model_and_params):
        cfg, model, params = tiny_model_and_params
        images = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, cfg.img_size, cfg.img_size, 3))
        agg = vggt.Aggregator(cfg)
        avars = {"params": params["params"]["aggregator"]}
        outs, start = agg.apply(avars, images)
        assert len(outs) == cfg.depth
        p = (cfg.img_size // cfg.patch_size) ** 2 + 1 + cfg.num_register_tokens
        assert outs[0].shape == (1, 2, p, 2 * cfg.embed_dim)
        assert start == 1 + cfg.num_register_tokens

    def test_first_frame_token_differs(self, tiny_model_and_params):
        """Frame 0 uses dedicated camera/register token values
        (slice_expand_and_flatten); with identical inputs the frame-0 camera
        token path must diverge from frame 1's."""
        cfg, model, params = tiny_model_and_params
        img = jax.random.uniform(jax.random.PRNGKey(1), (1, 1, cfg.img_size, cfg.img_size, 3))
        images = jnp.concatenate([img, img], axis=1)  # identical frames
        out = jax.jit(model.apply)(params, images)
        # pose encodings for the two identical frames should differ because
        # frame 0 carries the dedicated "query frame" camera token
        d = np.abs(np.asarray(out["pose_enc"][0, 0] - out["pose_enc"][0, 1]))
        assert d.max() > 1e-6


class TestFullModel:
    def test_forward_shapes(self, tiny_model_and_params):
        cfg, model, params = tiny_model_and_params
        s, hw = 2, cfg.img_size
        images = jax.random.uniform(jax.random.PRNGKey(2), (1, s, hw, hw, 3))
        out = jax.jit(model.apply)(params, images)
        assert out["pose_enc"].shape == (1, s, 9)
        assert len(out["pose_enc_list"]) == cfg.camera_iterations
        assert out["depth"].shape == (1, s, hw, hw, 1)
        assert out["depth_conf"].shape == (1, s, hw, hw)
        assert out["world_points"].shape == (1, s, hw, hw, 3)
        assert out["extrinsics"].shape == (1, s, 3, 4)
        assert out["intrinsics"].shape == (1, s, 3, 3)

    def test_outputs_finite_and_activated(self, tiny_model_and_params):
        cfg, model, params = tiny_model_and_params
        images = jax.random.uniform(jax.random.PRNGKey(3), (1, 2, cfg.img_size, cfg.img_size, 3))
        out = jax.jit(model.apply)(params, images)
        for k in ("depth", "depth_conf", "world_points", "pose_enc"):
            assert np.isfinite(np.asarray(out[k])).all(), k
        assert float(out["depth"].min()) > 0  # exp activation
        assert float(out["depth_conf"].min()) > 1  # expp1 activation
        # FoV entries are relu'd
        assert float(out["pose_enc"][..., 7:].min()) >= 0

    def test_gradients_flow(self, tiny_model_and_params):
        cfg, model, params = tiny_model_and_params
        images = jax.random.uniform(jax.random.PRNGKey(4), (1, 2, cfg.img_size, cfg.img_size, 3))

        def loss(p):
            out = model.apply(p, images)
            return jnp.mean(out["depth"]) + jnp.mean(out["pose_enc"] ** 2)

        g = jax.jit(jax.grad(loss))(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # camera + aggregator + both dpt heads all receive gradient
        gnorm = jax.tree_util.tree_map(lambda l: float(jnp.abs(l).max()), g)
        flat = jax.tree_util.tree_flatten_with_path(gnorm)[0]
        touched = {str(path[1].key) for path, v in flat if v > 0 for path in [path]}
        assert {"aggregator", "camera_head", "depth_head"} <= touched


class TestPoseEnc:
    def test_pose_encoding_roundtrip_extrinsics(self):
        rng = np.random.default_rng(0)
        q = rng.normal(size=(2, 3, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        t = rng.normal(size=(2, 3, 3)).astype(np.float32)
        fov = np.abs(rng.normal(size=(2, 3, 2))).astype(np.float32) + 0.5
        enc = jnp.concatenate([jnp.asarray(t), jnp.asarray(q), jnp.asarray(fov)], -1)
        extr, intr = vggt.pose_encoding_to_extri_intri(enc, (64, 96))
        from mvtracker_tpu.ops.gsplat import quat_to_rotmat

        np.testing.assert_allclose(np.asarray(extr[..., 3]), t, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(extr[..., :3]), np.asarray(quat_to_rotmat(jnp.asarray(q))), atol=1e-5
        )
        # intrinsics: fy from fov_h against image height 64
        fy = 32.0 / np.tan(fov[..., 0] / 2)
        np.testing.assert_allclose(np.asarray(intr[..., 1, 1]), fy, rtol=1e-5)

    def test_estimate_depth_and_poses_wrapper(self, tiny_model_and_params):
        cfg, model, params = tiny_model_and_params
        images = np.random.default_rng(0).uniform(size=(2, cfg.img_size, cfg.img_size, 3))
        depth, conf, extr, intr = vggt.estimate_depth_and_poses(
            model, params, images.astype(np.float32)
        )
        assert depth.shape == (2, cfg.img_size, cfg.img_size)
        assert extr.shape == (2, 3, 4) and intr.shape == (2, 3, 3)
