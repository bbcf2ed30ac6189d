"""Model size presets shared by the training / eval / export scripts.

One place for the synthetic-domain model ladder (the reference's analog is
the Hydra model group, `configs/model/*.yaml`): the scripts used to carry
three diverging copies of this table, which is exactly how an eval script
ends up silently constructing a model that does not match the checkpoint.

`flagship` is the reference-width configuration
(`mvtracker/models/core/mvtracker/mvtracker.py:94-128` defaults: fmaps 128,
6+6 depth, 64 virtual tracks, k=16, 4 corr levels); `small`/`medium` are
the narrow variants used for smoke runs and the synthetic-domain releases.
"""

from __future__ import annotations

from typing import Any

from mvtracker_tpu.models.mvtracker import MVTracker

BASE: dict[str, Any] = dict(sliding_window_len=8, corr_n_levels=3)

SIZES: dict[str, dict[str, Any]] = {
    "small": dict(
        fmaps_dim=64, num_heads=6, hidden_size=192, space_depth=3,
        time_depth=3, num_virtual_tracks=16, corr_neighbors=8,
    ),
    "medium": dict(
        fmaps_dim=96, num_heads=8, hidden_size=256, space_depth=4,
        time_depth=4, num_virtual_tracks=32, corr_neighbors=12,
        compute_dtype="bfloat16",
    ),
    # Reference-width model; window stays 8 on the 12-frame synthetic
    # clips so chaining is exercised.
    "flagship": dict(
        fmaps_dim=128, num_heads=8, hidden_size=384, space_depth=6,
        time_depth=6, num_virtual_tracks=64, corr_neighbors=16,
        corr_n_levels=4, compute_dtype="bfloat16",
    ),
}


def build_model(
    model_size: str,
    *,
    vis_geom: bool = False,
    vis_head_hidden: int = 0,
    corr_k0: int = 0,
    chain_velocity: float = 0.0,
    global_match: bool = False,
    knn_reuse: bool = False,
    **overrides: Any,
) -> MVTracker:
    """Construct an MVTracker from a size preset plus the eval/train knobs
    the scripts expose.

    corr_k0 > 0 widens the FINEST correlation level to k=corr_k0 while the
    other levels keep the preset's corr_neighbors (see
    `MVTracker.corr_neighbors_per_level`); 0 keeps uniform k.
    """
    kw = {**BASE, **SIZES[model_size]}
    if corr_k0:
        k = kw["corr_neighbors"]
        kw["corr_neighbors_per_level"] = (corr_k0,) + (k,) * (kw["corr_n_levels"] - 1)
    kw.update(
        vis_geom_features=vis_geom,
        vis_head_hidden=vis_head_hidden,
        chain_velocity=chain_velocity,
        global_match_init=global_match,
        corr_knn_reuse=knn_reuse,
    )
    kw.update(overrides)
    return MVTracker(**kw)
