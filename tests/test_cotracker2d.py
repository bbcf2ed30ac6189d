"""Learned monocular 2D tracker (models/cotracker2d.py): shape contracts,
adapter integration, and trainability."""

import jax
import jax.numpy as jnp
import numpy as np

from mvtracker_tpu.models.cotracker2d import CoTracker2D, LearnedTracker2D
from mvtracker_tpu.models.monocular import MonocularToMultiViewAdapter

TINY = dict(
    sliding_window_len=4,
    stride=4,
    fmaps_dim=16,
    num_heads=2,
    hidden_size=32,
    space_depth=1,
    time_depth=1,
    num_virtual_tracks=4,
    corr_n_levels=2,
    corr_patch_radius=2,
)


def make_2d_case(rng, t=6, h=32, w=32, m=5):
    rgbs = jnp.asarray(rng.uniform(0, 255, (t, h, w, 3)).astype(np.float32))
    q = np.stack(
        [
            rng.integers(0, t // 2, m).astype(np.float32),
            rng.uniform(4, w - 4, m).astype(np.float32),
            rng.uniform(4, h - 4, m).astype(np.float32),
        ],
        axis=-1,
    )
    return rgbs, jnp.asarray(q)


def test_tracker_shapes_and_finiteness():
    rng = np.random.default_rng(0)
    rgbs, q = make_2d_case(rng)
    trk = LearnedTracker2D(CoTracker2D(**TINY), params=None, n_iters=2)
    tracks, vis = trk(rgbs, q)
    assert np.asarray(tracks).shape == (6, 5, 2)
    assert np.asarray(vis).shape == (6, 5)
    assert np.isfinite(np.asarray(tracks)).all()


def test_adapter_lifts_learned_tracker():
    from tests.test_model import make_scene

    rng = np.random.default_rng(1)
    scene = make_scene(rng, v=2, t=6, h=32, w=32, n=4)
    trk = LearnedTracker2D(CoTracker2D(**TINY), params=None, n_iters=1)
    adapter = MonocularToMultiViewAdapter(trk)
    out = adapter(*scene)
    assert np.asarray(out["traj"]).shape == (6, 4, 3)
    assert np.isfinite(np.asarray(out["traj"])).all()


def test_overfit_loss_decreases():
    """A few optimization steps on a monocular proxy scene must reduce the
    tracking loss — the learning machinery works end to end."""
    import optax

    from mvtracker_tpu.datasets.datapoint import collate
    from mvtracker_tpu.datasets.loader import (
        MonocularProxyDataset,
        SyntheticSceneDataset,
    )
    from mvtracker_tpu.training import step as step_lib

    ds = MonocularProxyDataset(
        SyntheticSceneDataset(
            n_scenes=1, cache=True, n_views=2, n_frames=6,
            height=48, width=48, n_tracks=8, texture_detail=1.0,
        )
    )
    batch = collate([ds[0]])
    model = CoTracker2D(**TINY)
    optimizer = optax.adam(3e-3)
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    state = step_lib.init_state(model, optimizer, example, jax.random.PRNGKey(0), iters=2)
    train_step = step_lib.make_train_step(model, optimizer, iters=2)

    # Measured trend at this config with the ANALYTIC GT visibility labels
    # (round 3): 2.94 -> ~2.45 by step 48. Exact labels start the vis CE
    # lower than the old noisy z-buffer labels did, so the easy early
    # reduction is smaller; the coordinate loss still needs a few dozen
    # steps. Gate on a steady downward trend rather than one pinned ratio.
    losses = []
    for _ in range(48):
        state, metrics = train_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.88, losses
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.95, losses
