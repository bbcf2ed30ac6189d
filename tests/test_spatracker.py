"""MultiViewSpaTracker (triplane variant) smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.models.spatracker import MultiViewSpaTracker
from tests.test_model import make_scene


@pytest.fixture(scope="module")
def tiny_spatracker_out():
    rng = np.random.default_rng(0)
    model = MultiViewSpaTracker(
        sliding_window_len=4,
        stride=4,
        fmaps_dim=16,
        num_heads=2,
        hidden_size=32,
        space_depth=1,
        time_depth=1,
        num_virtual_tracks=4,
        corr_n_levels=2,
        triplane_res=16,
        corr_patch_radius=1,
    )
    args = make_scene(rng, v=2, t=6, h=32, w=32, n=5)
    params = model.init(jax.random.PRNGKey(0), *args, iters=2, is_train=True)
    out = model.apply(params, *args, iters=2, is_train=True)
    return model, params, args, out


def test_forward_shapes(tiny_spatracker_out):
    model, params, args, out = tiny_spatracker_out
    t, n = 6, 5
    assert out["traj"].shape == (t, n, 3)
    assert out["vis"].shape == (t, n)
    assert np.all(np.isfinite(np.asarray(out["traj"])))


def test_input_dim_accounting(tiny_spatracker_out):
    model, *_ = tiny_spatracker_out
    patch = (2 * model.corr_patch_radius + 1) ** 2
    expected = (64 + 1) * 3 + 3 * model.corr_n_levels * patch + model.fmaps_dim + 2
    assert model.updateformer_input_dim == expected


def test_grad_flows(tiny_spatracker_out):
    model, params, args, out = tiny_spatracker_out

    def loss_fn(p):
        o = model.apply(p, *args, iters=2, is_train=True)
        return jnp.mean(jnp.abs(o["train_data"]["coord_predictions"]))

    g = jax.grad(loss_fn)(params)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(total) and total > 0


def test_single_view_monocular_mode(rng):
    """V=1 triplane tracking == the monocular SpaTracker configuration
    (reference `spatracker_monocular.py` is the single-view variant)."""
    model = MultiViewSpaTracker(
        sliding_window_len=4, stride=4, fmaps_dim=16, num_heads=2,
        hidden_size=32, space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, triplane_res=16, corr_patch_radius=1,
    )
    args = make_scene(np.random.default_rng(1), v=1, t=4, h=32, w=32, n=4)
    params = model.init(jax.random.PRNGKey(0), *args, iters=1)
    out = model.apply(params, *args, iters=1)
    assert out["traj"].shape == (4, 4, 3)
    assert np.isfinite(np.asarray(out["traj"])).all()
