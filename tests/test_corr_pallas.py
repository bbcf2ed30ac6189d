"""Fused Pallas correlation kernel: parity vs the gather+einsum reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.ops import corr as corr_ops
from mvtracker_tpu.ops.corr_pallas import corr_select_pallas


def test_corr_select_matches_gather(rng):
    b, p, c, n, k = 2, 700, 32, 60, 8
    fvec = jnp.asarray(rng.normal(size=(b, p, c)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, p, size=(b, n, k)).astype(np.int32))

    ref = jnp.einsum(
        "bnc,bnkc->bnk", targets, corr_ops.gather_neighbors(fvec, idx)
    )
    out = corr_select_pallas(fvec, targets, idx, ref_tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_corr_sample_backend_parity(rng):
    """corr_sample(auto/pallas) must equal corr_sample(gather) numerically."""
    b, p, c, n, k = 1, 300, 16, 20, 4
    cloud_xyz = jnp.asarray(rng.normal(size=(b, p, 3)).astype(np.float32))
    fvec = jnp.asarray(rng.normal(size=(b, p, c)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    coords = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, p, size=(b, n, k)).astype(np.int32))

    ref = corr_ops.corr_sample(
        cloud_xyz, fvec, targets, coords, idx, backend="gather"
    )
    # Force the pallas path in interpret mode via monkeypatched default: call
    # the kernel directly and rebuild the concat to match corr_sample.
    corr = corr_select_pallas(fvec, targets, idx, ref_tile=128, interpret=True)
    corr = (corr[..., None] / jnp.sqrt(float(c))).astype(targets.dtype)
    offs = corr_ops.gather_neighbors(cloud_xyz, idx) - coords[:, :, None, :]
    out = jnp.concatenate([corr, offs], axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_corr_select_custom_vjp(rng):
    """Gradients of the fused kernel must match the gather+einsum path."""
    import jax

    b, p, c, n, k = 1, 260, 16, 12, 4
    fvec = jnp.asarray(rng.normal(size=(b, p, c)).astype(np.float32))
    targets = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, p, size=(b, n, k)).astype(np.int32))

    def loss_pallas(f, t):
        return jnp.sum(
            corr_select_pallas(f, t, idx, None, 128, True) ** 2
        )

    def loss_ref(f, t):
        nf = corr_ops.gather_neighbors(f, idx)
        return jnp.sum(jnp.einsum("bnc,bnkc->bnk", t, nf) ** 2)

    gf1, gt1 = jax.grad(loss_pallas, argnums=(0, 1))(fvec, targets)
    gf2, gt2 = jax.grad(loss_ref, argnums=(0, 1))(fvec, targets)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gt1), np.asarray(gt2), atol=1e-3)
