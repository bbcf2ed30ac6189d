"""Temporal chunking for long videos (reference demo frame-batch chunking,
`demo.py:694-880`): fixed-size segments through one reused compiled graph,
with boundary-position chaining of already-started tracks."""

import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
from mvtracker_tpu.models.copycat import CopyCatPredictor


@pytest.fixture(scope="module")
def scene():
    return synthetic.render_scene(
        seed=4, n_views=2, n_frames=18, height=32, width=32, n_tracks=8
    )


def _queries_with_late_starts(scene):
    q = np.asarray(scene.query_points_3d).copy()
    q[2, 0] = 7.0  # starts mid-segment 0
    q[5, 0] = 13.0  # starts inside segment 2 (chunk=6)
    return q


def test_chunked_matches_full_copycat(scene):
    """With a no-motion tracker, chunked tracking must equal full-video
    tracking exactly on every post-start frame (the chaining carries the
    position through unchanged)."""
    q = _queries_with_late_starts(scene)
    full = EvaluationPredictor(CopyCatPredictor(), None, interp_shape=None, grid_size=0)
    chunked = EvaluationPredictor(
        CopyCatPredictor(), None, interp_shape=None, grid_size=0, chunk_frames=6
    )
    args = (
        jnp.asarray(scene.video), jnp.asarray(scene.videodepth), jnp.asarray(q),
        jnp.asarray(scene.intrs), jnp.asarray(scene.extrs),
    )
    out_f = full(*args)
    out_c = chunked(*args)

    t = scene.video.shape[1]
    alive = np.arange(t)[:, None] >= q[None, :, 0]
    np.testing.assert_allclose(
        np.asarray(out_c["traj"])[alive], np.asarray(out_f["traj"])[alive], atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out_c["vis"])[alive], np.asarray(out_f["vis"])[alive], atol=1e-6
    )
    # Pre-start frames are masked to zero in the chunked path (matching the
    # real tracker's inactive-track semantics).
    assert np.all(np.asarray(out_c["traj"])[~alive] == 0.0)
    assert np.all(np.asarray(out_c["vis"])[~alive] == 0.0)


def test_chunked_real_model_smoke(scene):
    """The real tracker runs through the chunked path: finite outputs, full
    [T, N] coverage, and a non-chunk-multiple tail segment."""
    import jax

    from mvtracker_tpu.models.mvtracker import MVTracker

    model = MVTracker(
        sliding_window_len=4,
        fmaps_dim=16,
        num_heads=2,
        hidden_size=32,
        space_depth=1,
        time_depth=1,
        num_virtual_tracks=4,
        corr_n_levels=2,
        corr_neighbors=4,
    )
    q = _queries_with_late_starts(scene)
    args = (
        jnp.asarray(scene.video), jnp.asarray(scene.videodepth), jnp.asarray(q),
        jnp.asarray(scene.intrs), jnp.asarray(scene.extrs),
    )
    params = jax.jit(lambda k, *a: model.init(k, *a, iters=1))(
        jax.random.PRNGKey(0), args[0][:, :8], args[1][:, :8], args[2],
        args[3][:, :8], args[4][:, :8],
    )
    pred = EvaluationPredictor(
        model, params, interp_shape=None, grid_size=0, n_iters=1, chunk_frames=8
    )
    out = pred(*args)  # T=18 -> segments of 8, 8, 2 (tail edge-padded)
    t, n = scene.video.shape[1], q.shape[0]
    assert out["traj"].shape == (t, n, 3) and out["vis"].shape == (t, n)
    assert np.isfinite(np.asarray(out["traj"])).all()
    # Exactly one compiled graph served all three segments.
    assert len(pred._jitted) == 1


def test_small_chunk_placeholder_queries_stay_inert(scene):
    """chunk_frames < sliding_window_len: not-yet-started tracks must stay
    OUT of earlier segments' attention. Pre-fix, their placeholder start
    time (2*chunk) was inside the model's active window when S > 2*chunk,
    so a late query's (garbage) coordinates perturbed early tracks."""
    import jax

    from mvtracker_tpu.models.mvtracker import MVTracker

    model = MVTracker(
        sliding_window_len=6,
        fmaps_dim=16,
        num_heads=2,
        hidden_size=32,
        space_depth=1,
        time_depth=1,
        num_virtual_tracks=4,
        corr_n_levels=2,
        corr_neighbors=4,
    )
    t = scene.video.shape[1]
    q = np.asarray(scene.query_points_3d).copy()[:6]
    q[:, 0] = 0.0
    q[-1, 0] = t - 1  # starts in the LAST segment

    def run(late_xyz_offset):
        qq = q.copy()
        qq[-1, 1:] += late_xyz_offset
        args = (
            jnp.asarray(scene.video), jnp.asarray(scene.videodepth),
            jnp.asarray(qq), jnp.asarray(scene.intrs), jnp.asarray(scene.extrs),
        )
        params = jax.jit(lambda k, *a: model.init(k, *a, iters=1))(
            jax.random.PRNGKey(0), args[0][:, :2], args[1][:, :2], args[2],
            args[3][:, :2], args[4][:, :2],
        )
        pred = EvaluationPredictor(
            model, params, interp_shape=None, grid_size=0, n_iters=1,
            chunk_frames=2,  # chunk < S: the leak-prone configuration
        )
        return np.asarray(pred(*args)["traj"])

    t1 = run(0.0)
    t2 = run(1e3)  # absurd coords in the not-yet-started track
    # Early tracks, early frames: independent of the late query's position.
    np.testing.assert_array_equal(t1[: t - 2, :-1], t2[: t - 2, :-1])


def test_chunked_triplane_variant_stays_finite(scene):
    """The triplane SpaTracker through the chunked predictor with a
    late-starting query: the inert placeholder start time gathers past the
    segment's frame axis, which NaN-filled feat_init pre-fix."""
    import jax

    from mvtracker_tpu.models.spatracker import MultiViewSpaTracker

    model = MultiViewSpaTracker(
        sliding_window_len=4, fmaps_dim=16, num_heads=2, hidden_size=32,
        space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, triplane_res=16, support_memory_tokens=0,
    )
    q = _queries_with_late_starts(scene)
    args = (
        jnp.asarray(scene.video), jnp.asarray(scene.videodepth), jnp.asarray(q),
        jnp.asarray(scene.intrs), jnp.asarray(scene.extrs),
    )
    params = jax.jit(lambda k, *a: model.init(k, *a, iters=1))(
        jax.random.PRNGKey(0), args[0][:, :8], args[1][:, :8], args[2],
        args[3][:, :8], args[4][:, :8],
    )
    pred = EvaluationPredictor(
        model, params, interp_shape=None, grid_size=0, n_iters=1, chunk_frames=8
    )
    out = pred(*args)
    assert np.isfinite(np.asarray(out["traj"])).all()
    assert np.isfinite(np.asarray(out["vis"])).all()
