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
