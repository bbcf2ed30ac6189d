"""Hub-wrapper layer for external monocular trackers (VERDICT r2 #8).

Done-criterion: the wrapper drives the MonocularToMultiViewAdapter in a
test with a mocked hub model — so a real checkpoint is one download away,
with all pre/post plumbing (layout conversion, support-grid trimming,
online chunking) already exercised.
"""

import numpy as np
import pytest
import torch

from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.models.hub_baselines import (
    CoTrackerOfflineWrapper,
    CoTrackerOnlineWrapper,
    load_monocular_hub_tracker,
)
from mvtracker_tpu.models.monocular import MonocularToMultiViewAdapter


class _MockCoTrackerOffline(torch.nn.Module):
    """CoTracker predictor interface: returns queries held static, plus
    grid_size^2 support tracks appended after the real queries."""

    def forward(self, video, queries, grid_size=0):
        b, t = video.shape[:2]
        m = queries.shape[1]
        tracks = queries[:, None, :, 1:].repeat(1, t, 1, 1)  # [B,T,M,2]
        support = torch.zeros(b, t, grid_size**2, 2)
        tracks = torch.cat([tracks, support], dim=2)
        vis = torch.ones(b, t, tracks.shape[2])
        return tracks, vis


class _MockCoTrackerOnline(torch.nn.Module):
    step = 2

    def __init__(self):
        super().__init__()
        self._queries = None
        self._t_total = 0

    def forward(self, video_chunk, queries=None, grid_size=0, is_first_step=False):
        if is_first_step:
            self._queries = queries
            self._t_total = video_chunk.shape[1]
            return None
        self._t_total = max(self._t_total, video_chunk.shape[1])
        b = video_chunk.shape[0]
        t = self._t_total
        m = self._queries.shape[1]
        tracks = self._queries[:, None, :, 1:].repeat(1, t, 1, 1)
        vis = torch.ones(b, t, m)
        return tracks, vis


def _mock_loader_offline(repo, name):
    assert repo == "facebookresearch/co-tracker"
    return _MockCoTrackerOffline()


def _mock_loader_online(repo, name):
    return _MockCoTrackerOnline()


def test_offline_wrapper_contract():
    w = CoTrackerOfflineWrapper(grid_size=3, hub_loader=_mock_loader_offline)
    rgbs = np.zeros((5, 16, 16, 3), np.float32)
    queries = np.array([[0, 4.0, 5.0], [1, 8.0, 2.0]], np.float32)
    tracks, vis = w(rgbs, queries)
    assert tracks.shape == (5, 2, 2)  # support-grid tracks trimmed
    assert vis.shape == (5, 2)
    np.testing.assert_allclose(tracks[3, 0], [4.0, 5.0])


def test_online_wrapper_chunks():
    w = CoTrackerOnlineWrapper(hub_loader=_mock_loader_online)
    rgbs = np.zeros((8, 16, 16, 3), np.float32)
    queries = np.array([[0, 3.0, 3.0]], np.float32)
    tracks, vis = w(rgbs, queries)
    assert tracks.shape == (8, 1, 2)
    np.testing.assert_allclose(tracks[:, 0, 0], 3.0)


def test_wrapper_drives_adapter_end_to_end():
    """Mocked hub model -> wrapper -> adapter -> 3D API on a real scene."""
    dp = synthetic.render_scene(seed=4, n_views=2, n_frames=5, height=32,
                                width=32, n_tracks=6)
    tracker = CoTrackerOfflineWrapper(grid_size=2, hub_loader=_mock_loader_offline)
    adapter = MonocularToMultiViewAdapter(tracker)
    out = adapter(
        dp.video, dp.videodepth, dp.query_points_3d, dp.intrs, dp.extrs
    )
    traj = np.asarray(out["traj"])
    assert traj.shape == (5, 6, 3)
    assert np.isfinite(traj).all()
    # A no-motion 2D mock lifted through per-frame depth at the query pixel
    # stays near the query's world position on its query frame.
    qt = dp.query_points_3d[:, 0].astype(int)
    q_world = dp.query_points_3d[:, 1:]
    at_query = traj[qt, np.arange(6)]
    err = np.linalg.norm(at_query - q_world, axis=-1)
    assert np.median(err) < 0.2, err


def test_registry_names_and_failure_modes():
    t = load_monocular_hub_tracker("cotracker3_offline",
                                   hub_loader=_mock_loader_offline)
    assert isinstance(t, CoTrackerOfflineWrapper)
    with pytest.raises(NotImplementedError, match="vendored repo"):
        load_monocular_hub_tracker("delta")
    with pytest.raises(KeyError):
        load_monocular_hub_tracker("not_a_tracker")
    # The default loader fails FAST (no network hang) when nothing is cached.
    with pytest.raises(RuntimeError, match="egress|cached"):
        CoTrackerOfflineWrapper()


def test_config_fallback_builds():
    """Preset build for a hub name degrades to the NCC tracker offline."""
    from mvtracker_tpu.config import ModelConfig, build_model

    model = build_model(ModelConfig(name="cotracker3_offline"))
    assert isinstance(model, MonocularToMultiViewAdapter)
