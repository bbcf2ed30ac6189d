"""CopyCat: the no-motion baseline (L3).

Mirrors reference `mvtracker/models/core/copycat.py:5-39` — emits the query
position for every frame with full visibility. It is the evaluator API
contract in miniature and validates the harness independent of any learned
model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class CopyCat:
    """Callable with the scene-level tracker interface."""

    def __call__(
        self,
        rgbs: jax.Array,  # [V, T, H, W, 3]
        depths: jax.Array,  # [V, T, H, W]
        query_points: jax.Array,  # [N, 4]
        intrs: jax.Array,
        extrs: jax.Array,
        **kwargs,
    ) -> dict:
        t = rgbs.shape[1]
        n = query_points.shape[0]
        traj = jnp.broadcast_to(query_points[None, :, 1:], (t, n, 3))
        vis = jnp.ones((t, n), jnp.float32)
        return {"traj": traj, "vis": vis, "occluded": vis < 0.5}
