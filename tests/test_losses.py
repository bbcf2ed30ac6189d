"""Loss numerics tests against hand-computed values (reference semantics:
`mvtracker/models/core/losses.py:22-73`)."""

import jax.numpy as jnp
import numpy as np

from mvtracker_tpu.training import losses


def test_sequence_loss_perfect_prediction_is_zero():
    w, iters, s, n = 2, 3, 4, 5
    gt = jnp.asarray(np.random.default_rng(0).normal(size=(w, s, n, 3)), jnp.float32)
    preds = jnp.broadcast_to(gt[:, None], (w, iters, s, n, 3))
    valid = jnp.ones((w, s, n))
    out = losses.sequence_loss_3d(preds, gt, valid)
    assert float(out) < 1e-6


def test_sequence_loss_discounting():
    """Later iterations must be weighted more (gamma^(I-i-1))."""
    w, s, n = 1, 2, 2
    gt = jnp.zeros((w, s, n, 3))
    valid = jnp.ones((w, s, n))
    err = jnp.ones((w, s, n, 3))
    # Case A: error only at the last iteration. Case B: only at the first.
    preds_a = jnp.stack([jnp.zeros_like(err), err], axis=1)
    preds_b = jnp.stack([err, jnp.zeros_like(err)], axis=1)
    la = float(losses.sequence_loss_3d(preds_a, gt, valid, gamma=0.8, dmin=0, dmax=1, dz=1))
    lb = float(losses.sequence_loss_3d(preds_b, gt, valid, gamma=0.8, dmin=0, dmax=1, dz=1))
    assert la > lb
    np.testing.assert_allclose(lb / la, 0.8, atol=1e-5)


def test_z_renormalization():
    """The z channel is scaled by Dz/(dmax-dmin) — reference `losses.py:66-67`."""
    w, iters, s, n = 1, 1, 1, 1
    gt = jnp.zeros((w, s, n, 3))
    pred = jnp.zeros((w, iters, s, n, 3)).at[..., 2].set(1.0)
    valid = jnp.ones((w, s, n))
    out = float(losses.sequence_loss_3d(pred, gt, valid, gamma=1.0, dmin=0.1, dmax=65, dz=128))
    np.testing.assert_allclose(out, (1.0 * 128 / 64.9) / 3, rtol=1e-5)


def test_balanced_ce_balances_pos_neg():
    w, s, n = 1, 1, 4
    # 3 negatives predicted perfectly, 1 positive predicted badly: with
    # balancing, the positive loss is NOT diluted by the 3 easy negatives.
    gt = jnp.asarray([[[1.0, 0.0, 0.0, 0.0]]])
    logits = jnp.asarray([[[-5.0, -10.0, -10.0, -10.0]]])
    valid = jnp.ones((w, s, n))
    out = float(losses.balanced_ce_loss(logits, gt, valid))
    # pos_loss ~= softplus(5) ~= 5.0067; neg_loss ~= softplus(-10) ~= 4.5e-5
    np.testing.assert_allclose(out, 5.0067 + 4.54e-5, rtol=1e-3)


def test_window_validity_masks_padded_and_inactive():
    t, n, s = 5, 2, 4
    valid = jnp.ones((t, n))
    query_t = jnp.asarray([0, 3])
    starts = np.asarray([0, 2])
    active = jnp.asarray([[True, False], [True, True]])
    vw = losses.window_validity(valid, query_t, starts, s, active, t)
    assert vw.shape == (2, s, n)
    # Window 0 (frames 0-3): point 0 valid everywhere; point 1 inactive.
    np.testing.assert_allclose(np.asarray(vw[0, :, 0]), 1.0)
    np.testing.assert_allclose(np.asarray(vw[0, :, 1]), 0.0)
    # Window 1 (frames 2-5; frame 5 padded): point 1 valid from its query
    # frame 3 up to the last real frame 4.
    np.testing.assert_allclose(np.asarray(vw[1, :, 1]), [0.0, 1.0, 1.0, 0.0])


def test_feature_identity_loss():
    """Aux InfoNCE on encoder features: finite, near-chance for random
    features, near-zero for features that already encode track identity,
    and it back-propagates into the encoder through scene_loss."""
    import jax
    import jax.numpy as jnp

    from mvtracker_tpu.datasets import synthetic
    from mvtracker_tpu.training import step as step_lib
    from mvtracker_tpu.training.losses import feature_identity_loss
    from mvtracker_tpu.models.mvtracker import MVTracker

    dp = synthetic.render_scene(
        seed=2, n_views=2, n_frames=6, height=32, width=32, n_tracks=8,
        texture_noise=1.0,
    )
    v, t, h, w = dp.videodepth.shape
    c, stride = 16, 4
    rng = np.random.default_rng(0)
    fmaps = jnp.asarray(rng.normal(size=(v, t, h // stride, w // stride, c)), jnp.float32)
    args = (jnp.asarray(dp.videodepth), jnp.asarray(dp.intrs), jnp.asarray(dp.extrs),
            jnp.asarray(dp.trajectory_3d))
    loss_rand = float(feature_identity_loss(fmaps, *args[:3], args[3], stride=stride))
    assert np.isfinite(loss_rand)
    # Random features ~ chance level: around log(N) for N-way InfoNCE.
    assert loss_rand > 0.5 * np.log(8)

    # scene_loss with feat_id_weight routes gradient into the encoder.
    model = MVTracker(
        sliding_window_len=4, fmaps_dim=16, num_heads=2, hidden_size=32,
        space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    scene = {
        "rgbs": jnp.asarray(dp.video, jnp.float32),
        "depths": jnp.asarray(dp.videodepth, jnp.float32),
        "query_points": jnp.asarray(dp.query_points_3d, jnp.float32),
        "intrs": jnp.asarray(dp.intrs), "extrs": jnp.asarray(dp.extrs),
        "traj_gt": jnp.asarray(dp.trajectory_3d),
        "vis_gt": jnp.asarray(dp.visibility.any(0), jnp.float32),
        "valid": jnp.ones((t, 8), jnp.float32),
    }
    params = model.init(jax.random.PRNGKey(0), scene["rgbs"], scene["depths"],
                        scene["query_points"], scene["intrs"], scene["extrs"],
                        iters=1, is_train=True)

    def fid_only(p):
        _, parts = step_lib.scene_loss(model, p, scene, iters=1, gamma=0.8,
                                       vis_weight=0.0, feat_id_weight=1.0)
        return parts["feat_id"]

    g = jax.grad(fid_only)(params)
    enc = g["params"]["fnet"]
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(enc))
    assert np.isfinite(total) and total > 0
