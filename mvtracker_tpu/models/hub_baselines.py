"""Hub-downloaded 2D tracker wrappers (the reference's monocular zoo).

Counterparts of `mvtracker/models/core/monocular_baselines.py:78-127`
(`CoTrackerOfflineWrapper` / `CoTrackerOnlineWrapper`): load an external
torch 2D point tracker from torch.hub and expose it through the
`MonocularToMultiViewAdapter` tracker_2d contract

    tracker(rgbs [T, H, W, 3] float 0..255, queries [M, 3] (t, x, y))
        -> (tracks [T, M, 2] pixel xy, vis [T, M] in [0, 1])

so any hub checkpoint is one download away from driving the full 3D
evaluation stack. The hub loader is injectable: offline environments (and
tests) pass a factory returning any torch-callable with the CoTracker
predictor interface; by default `torch.hub.load` is used and its weights
cache (`~/.cache/torch/hub`) makes repeat loads offline-safe.

The remaining reference wrappers (SpaTrackerV2, LocoTrack, SceneTracker,
DELTA, TAPIP3D — `monocular_baselines.py:127-603`) each require a vendored
external repo; `load_monocular_hub_tracker` reserves their names and
reports exactly what is missing rather than silently substituting.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def _default_hub_loader(repo: str, model_name: str):
    import os

    import torch

    # Zero-egress guard: torch.hub.load would try a GitHub fetch when the
    # repo checkout is not already cached — fail fast instead of hanging
    # the preset-build path on a dead network.
    hub_dir = torch.hub.get_dir()
    prefix = repo.replace("/", "_")
    cached = os.path.isdir(hub_dir) and any(
        d.startswith(prefix) for d in os.listdir(hub_dir)
    )
    if not cached:
        raise RuntimeError(
            f"torch.hub checkout for {repo} not cached under {hub_dir} "
            "and this environment has no network egress; pre-populate the "
            "hub cache to enable this baseline"
        )
    return torch.hub.load(repo, model_name)


class CoTrackerOfflineWrapper:
    """facebookresearch/co-tracker offline predictor -> tracker_2d contract.

    Mirrors reference `CoTrackerOfflineWrapper` (`monocular_baselines.py:
    78-99`): one whole-video forward with support-grid augmentation.
    """

    def __init__(
        self,
        model_name: str = "cotracker3_offline",
        grid_size: int = 10,
        hub_loader: Optional[Callable] = None,
    ):
        loader = hub_loader or _default_hub_loader
        self.grid_size = grid_size
        self.model = loader("facebookresearch/co-tracker", model_name)

    def __call__(self, rgbs, queries):
        import torch

        rgbs = np.array(rgbs, np.float32, copy=True)  # [T, H, W, 3] 0..255
        queries = np.array(queries, np.float32, copy=True)  # [M, 3] (t, x, y)
        video = torch.from_numpy(rgbs).permute(0, 3, 1, 2)[None]  # [1,T,3,H,W]
        q = torch.from_numpy(queries)[None]
        with torch.no_grad():
            tracks, vis = self.model(
                video=video.float(), queries=q.float(), grid_size=self.grid_size
            )
        m = queries.shape[0]
        # Hub predictors may append support-grid tracks; ours come first.
        return (
            tracks[0, :, :m].cpu().numpy(),
            vis[0, :, :m].float().cpu().numpy(),
        )


class CoTrackerOnlineWrapper:
    """facebookresearch/co-tracker online (sliding-window) predictor.

    Mirrors reference `CoTrackerOnlineWrapper` (`monocular_baselines.py:
    101-127`): prime with is_first_step, then advance by the model's
    native step over overlapping chunks.
    """

    def __init__(
        self,
        model_name: str = "cotracker3_online",
        grid_size: int = 10,
        hub_loader: Optional[Callable] = None,
    ):
        loader = hub_loader or _default_hub_loader
        self.grid_size = grid_size
        self.model = loader("facebookresearch/co-tracker", model_name)

    def __call__(self, rgbs, queries):
        import torch

        rgbs = np.array(rgbs, np.float32, copy=True)
        queries = np.array(queries, np.float32, copy=True)
        t = rgbs.shape[0]
        video = torch.from_numpy(rgbs).permute(0, 3, 1, 2)[None]
        q = torch.from_numpy(queries)[None]
        step = int(getattr(self.model, "step", 4))
        with torch.no_grad():
            self.model(
                video_chunk=video.float(),
                queries=q.float(),
                grid_size=self.grid_size,
                is_first_step=True,
            )
            tracks = vis = None
            for ti in range(0, max(t - step, 1), step):
                tracks, vis = self.model(
                    video_chunk=video[:, ti : ti + step * 2].float()
                )
        m = queries.shape[0]
        return (
            tracks[0, :, :m].cpu().numpy(),
            vis[0, :, :m].float().cpu().numpy(),
        )


_HUB_WRAPPERS = {
    "cotracker3_offline": (CoTrackerOfflineWrapper, "cotracker3_offline"),
    "cotracker3_online": (CoTrackerOnlineWrapper, "cotracker3_online"),
    "cotracker2_offline": (CoTrackerOfflineWrapper, "cotracker2"),
    "cotracker2_online": (CoTrackerOnlineWrapper, "cotracker2_online"),
}

# Wrappers that additionally need a vendored third-party repo on disk
# (reference installs them as editable checkouts, monocular_baselines.py
# SpaTrackerV2Wrapper:127 / LocoTrackWrapper:223 / SceneTrackerWrapper:295 /
# DELTAWrapper:356 / TAPIP3DWrapper:433).
_NEEDS_VENDORED_REPO = {
    "spatialtrackerv2": "SpaTrackerV2 (github.com/henry123-boy/SpaTrackerV2)",
    "locotrack": "LocoTrack (github.com/cvlab-kaist/locotrack)",
    "scenetracker": "SceneTracker (github.com/wwsource/SceneTracker)",
    "delta": "DELTA (github.com/snap-research/DELTA_densetrack3d)",
    "tapip3d": "TAPIP3D (github.com/zbww/tapip3d)",
}


def load_monocular_hub_tracker(
    name: str,
    grid_size: int = 10,
    hub_loader: Optional[Callable] = None,
):
    """Resolve a reference baseline name to an adapter-ready 2D tracker.

    Raises with an actionable message when the backing network cannot be
    constructed in this environment (no silent substitution — the config
    layer decides about fallbacks).
    """
    if name in _HUB_WRAPPERS:
        cls, model_name = _HUB_WRAPPERS[name]
        return cls(model_name=model_name, grid_size=grid_size, hub_loader=hub_loader)
    if name in _NEEDS_VENDORED_REPO:
        raise NotImplementedError(
            f"{name} needs the vendored repo {_NEEDS_VENDORED_REPO[name]} plus "
            "its released checkpoint; wrap its predictor in the tracker_2d "
            "contract (see CoTrackerOfflineWrapper) once the code is on disk."
        )
    raise KeyError(f"unknown hub baseline: {name}")
