"""CopyCat: the no-motion baseline (L3).

Mirrors reference `mvtracker/models/core/copycat.py:5-39` — emits the query
position for every frame with full visibility. It is the evaluator API
contract in miniature and validates the harness independent of any learned
model.
"""

from __future__ import annotations

import numpy as np


class CopyCat:
    """Callable with the scene-level tracker interface.

    Pure numpy on purpose: the baseline must cost zero accelerator traffic
    (over a tunneled TPU, even a single eager device op costs seconds)."""

    # Host-side; the EvaluationPredictor must not jit it.
    jit_compatible = False

    def __call__(
        self,
        rgbs,  # [V, T, H, W, 3]
        depths,  # [V, T, H, W]
        query_points,  # [N, 4]
        intrs,
        extrs,
        **kwargs,
    ) -> dict:
        t = rgbs.shape[1]
        n = query_points.shape[0]
        q = np.asarray(query_points)
        traj = np.broadcast_to(q[None, :, 1:], (t, n, 3))
        vis = np.ones((t, n), np.float32)
        return {"traj": traj, "vis": vis, "occluded": vis < 0.5}


class CopyCatPredictor:
    """Jit-traceable CopyCat with the EvaluationPredictor plain-callable
    contract (`predictor.py` `jit_compatible` branch): inputs may be
    tracers, so the body is jnp, not numpy. Used by the evaluator tests and
    the checkpoint-eval / train-synthetic scripts as the no-motion
    baseline (reference `mvtracker/models/core/copycat.py:5-39`)."""

    def __call__(self, rgbs, depths, query_points, intrs, extrs, rng_key=None):
        import jax.numpy as jnp

        t = rgbs.shape[1]
        n = query_points.shape[0]
        traj = jnp.broadcast_to(query_points[None, :, 1:], (t, n, 3))
        vis = jnp.ones((t, n))
        return {"traj": traj, "vis": vis, "occluded": vis < 0.5}
