"""Inference-server tests: the resident-predictor HTTP surface."""

import io
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from mvtracker_tpu.cli.serve import build_server
from mvtracker_tpu.datasets import synthetic
from mvtracker_tpu.models.mvtracker import MVTracker


@pytest.fixture(scope="module")
def server_and_scene():
    sc = synthetic.render_scene(seed=0, n_views=2, n_frames=8, height=48, width=48, n_tracks=8)
    model = MVTracker(
        sliding_window_len=4, fmaps_dim=16, num_heads=2, hidden_size=32,
        space_depth=1, time_depth=1, num_virtual_tracks=4,
        corr_n_levels=2, corr_neighbors=4,
    )
    params = jax.jit(lambda k, *a: model.init(k, *a, iters=1))(
        jax.random.PRNGKey(0),
        sc.video, sc.videodepth, sc.query_points_3d, sc.intrs, sc.extrs,
    )
    server, _ = build_server(
        model, params, port=0, interp_shape=None, grid_size=0, n_iters=1
    )
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{server.server_address[1]}", sc
    server.shutdown()


def _post_npz(url, **arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status, resp.read()


def test_track_roundtrip(server_and_scene):
    base, sc = server_and_scene
    status, body = _post_npz(
        base + "/track",
        rgbs=sc.video, depths=sc.videodepth, query_points=sc.query_points_3d,
        intrs=sc.intrs, extrs=sc.extrs,
    )
    assert status == 200
    out = np.load(io.BytesIO(body))
    t, n = sc.video.shape[1], sc.query_points_3d.shape[0]
    assert out["traj"].shape == (t, n, 3)
    assert out["vis"].shape == (t, n)
    assert np.isfinite(out["traj"]).all()

    # Same shape again: served from the warm compiled graph.
    status2, _ = _post_npz(
        base + "/track",
        rgbs=sc.video, depths=sc.videodepth, query_points=sc.query_points_3d,
        intrs=sc.intrs, extrs=sc.extrs,
    )
    assert status2 == 200

    with urllib.request.urlopen(base + "/healthz") as resp:
        health = json.loads(resp.read())
    assert health["requests"] == 2
    assert health["compiled_shapes"] == 1  # one shape -> one executable


def test_malformed_request_keeps_serving(server_and_scene):
    base, sc = server_and_scene
    req = urllib.request.Request(base + "/track", data=b"not an npz", method="POST")
    try:
        urllib.request.urlopen(req)
        raised = False
    except urllib.error.HTTPError as e:
        raised = e.code == 400
    assert raised
    # Server still alive and healthy.
    with urllib.request.urlopen(base + "/healthz") as resp:
        health = json.loads(resp.read())
    assert health["errors"] >= 1
