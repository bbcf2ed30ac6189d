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
