"""Aux-subsystem tests: kNN stats hooks, ranked logging, hang watchdog.

Covers the SURVEY §5 observability parity items: the reference's
`init_stats`/`consume_stats` neighbor-distance tables
(`mvtracker/mvtracker.py:190-242`), `RankedLogger`
(`cli/utils/pylogger.py`), and the faulthandler hang watchdog
(`cli/utils/helpers.py:45-47`).
"""

import logging

import jax
import numpy as np

from mvtracker_tpu.models.mvtracker import MVTracker, consume_stats, window_starts
from mvtracker_tpu.utils import observability as obs
from tests.test_model import make_scene


def test_collect_stats_table():
    rng = np.random.default_rng(0)
    model = MVTracker(
        sliding_window_len=6,
        stride=4,
        fmaps_dim=32,
        num_heads=2,
        hidden_size=64,
        space_depth=2,
        time_depth=2,
        num_virtual_tracks=4,
        corr_n_levels=2,
        corr_neighbors=4,
        collect_stats=True,
    )
    args = make_scene(rng, v=2, t=8, h=32, w=48, n=6)
    params = model.init(jax.random.PRNGKey(0), *args, iters=2)
    out, variables = model.apply(params, *args, iters=2, mutable=["intermediates"])
    assert "traj" in out

    df = consume_stats(variables["intermediates"])
    n_wind = len(window_starts(8, 6))
    # One row per (window, iteration, level, k-rank).
    assert len(df) == n_wind * 2 * 2 * 4
    assert set(df.columns) == {"window", "iteration", "level", "k", "mean_dist"}
    assert (df["mean_dist"] >= 0).all()
    assert np.isfinite(df["mean_dist"]).all()
    # Distances are sorted ascending within each (window, iteration, level).
    for _, g in df.groupby(["window", "iteration", "level"]):
        d = g.sort_values("k")["mean_dist"].to_numpy()
        assert (np.diff(d) >= -1e-6).all()


def test_collect_stats_off_means_no_intermediates():
    rng = np.random.default_rng(0)
    model = MVTracker(
        sliding_window_len=6, stride=4, fmaps_dim=32, num_heads=2, hidden_size=64,
        space_depth=1, time_depth=1, num_virtual_tracks=4, corr_n_levels=1,
        corr_neighbors=4,
    )
    args = make_scene(rng, v=2, t=6, h=32, w=48, n=4)
    params = model.init(jax.random.PRNGKey(0), *args, iters=1)
    _, variables = model.apply(params, *args, iters=1, mutable=["intermediates"])
    assert not variables.get("intermediates", {})


def test_ranked_logger(caplog):
    log = obs.RankedLogger("test_ranked", rank_zero_only=False)
    with caplog.at_level(logging.INFO, logger="test_ranked"):
        log.info("hello %s", "world")
    assert any("[rank 0] hello world" in r.getMessage() for r in caplog.records)

    # rank-restricted emission: single-process index is 0, so rank=1 drops.
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="test_ranked"):
        log.log(logging.INFO, "only on rank 1", rank=1)
    assert not caplog.records


def test_hang_watchdog_smoke():
    obs.install_hang_watchdog(60.0)
    obs.reset_hang_watchdog(60.0)
    obs.cancel_hang_watchdog()


def test_device_memory_stats_shape():
    stats = obs.device_memory_stats()
    for v in stats.values():
        assert "bytes_in_use_mb" in v and "peak_bytes_in_use_mb" in v
