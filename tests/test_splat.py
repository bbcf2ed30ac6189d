"""Softmax splatting tests (reference semantics:
`spatracker/softsplat.py:218-275`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.ops.splat import softsplat, splat_points


def test_zero_flow_identity():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(1, 8, 10, 3)).astype(np.float32))
    flow = jnp.zeros((1, 8, 10, 2))
    out = softsplat(img, flow, mode="avg")
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_integer_shift():
    img = jnp.zeros((1, 6, 6, 1)).at[0, 2, 2, 0].set(5.0)
    flow = jnp.zeros((1, 6, 6, 2)).at[..., 0].set(2.0)  # shift x by +2
    out = softsplat(img, flow, mode="sum")
    assert float(out[0, 2, 4, 0]) == pytest.approx(5.0, abs=1e-5)
    assert float(out[0, 2, 2, 0]) == pytest.approx(0.0, abs=1e-5)


def test_soft_mode_weighting():
    """Two pixels landing on the same target: higher metric dominates."""
    img = jnp.zeros((1, 4, 4, 1))
    img = img.at[0, 0, 0, 0].set(1.0).at[0, 0, 2, 0].set(3.0)
    flow = jnp.zeros((1, 4, 4, 2))
    flow = flow.at[0, 0, 0, 0].set(1.0)  # (0,0) -> (1,0)
    flow = flow.at[0, 0, 2, 0].set(-1.0)  # (2,0) -> (1,0)
    metric = jnp.zeros((1, 4, 4)).at[0, 0, 2].set(10.0)  # favor value 3
    out = softsplat(img, flow, metric, mode="soft")
    assert float(out[0, 0, 1, 0]) == pytest.approx(3.0, abs=1e-2)


def test_fractional_flow_bilinear():
    img = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(4.0)
    flow = jnp.zeros((1, 4, 4, 2)).at[0, 1, 1, 0].set(0.5)
    out = softsplat(img, flow, mode="sum")
    assert float(out[0, 1, 1, 0]) == pytest.approx(2.0, abs=1e-5)
    assert float(out[0, 1, 2, 0]) == pytest.approx(2.0, abs=1e-5)


def test_splat_points_grad():
    """The scatter formulation must be differentiable (the reference needs a
    hand-written CUDA backward, `softsplat.py:374-450`; XLA gives it free)."""
    import jax

    def loss(feat):
        plane = splat_points(
            jnp.asarray([[[1.2, 2.3], [0.5, 0.5]]]),
            feat,
            jnp.zeros((1, 2)),
            4, 4,
        )
        return jnp.sum(plane**2)

    g = jax.grad(loss)(jnp.ones((1, 2, 3)))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0
