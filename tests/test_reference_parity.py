"""Architecture parity: the reference torch MVTracker and this framework's
MVTracker must compute (numerically) the same function once weights are
converted — the strongest faithfulness evidence short of the released
checkpoint itself.

Runs the reference model on CPU (its torch-cdist kNN fallback) on a small
synthetic scene, converts its randomly initialized weights with
`mvtracker_tpu.convert`, and compares predicted trajectories.
"""

import numpy as np
import pytest

from mvtracker_tpu.convert import convert_reference_state_dict
from mvtracker_tpu.models.mvtracker import MVTracker
from tests.reference_compat import load_reference_mvtracker
from tests.test_model import make_scene

CFG = dict(
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
)


def run_reference(scene, cfg, iters, seed=0, **model_kwargs):
    """Run the reference torch MVTracker on a scene; return (traj, vis, params)."""
    import torch

    TorchMVT = load_reference_mvtracker()
    torch.manual_seed(seed)
    tm = TorchMVT(use_flash_attention=False, **cfg, **model_kwargs).eval()
    rgbs, depths, query, intrs, extrs = scene
    with torch.no_grad():
        out = tm(
            rgbs=torch.from_numpy(rgbs.transpose(0, 1, 4, 2, 3)[None]).float(),
            depths=torch.from_numpy(depths[:, :, None][None]).float(),
            query_points=torch.from_numpy(query[None]).float(),
            intrs=torch.from_numpy(intrs[None]).float(),
            extrs=torch.from_numpy(extrs[None]).float(),
            iters=iters,
        )
    sd = {k: v_.numpy() for k, v_ in tm.state_dict().items()}
    params = convert_reference_state_dict(sd)
    return out["traj_e"][0].numpy(), out["vis_e"][0].numpy(), params


def run_ours(scene, cfg, iters, params, **model_kwargs):
    import jax.numpy as jnp

    model = MVTracker(**cfg, **model_kwargs)
    out = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params["params"])},
        *[jnp.asarray(a) for a in scene],
        iters=iters,
    )
    return np.asarray(out["traj"]), np.asarray(out["vis"])


@pytest.fixture(scope="module")
def parity_case():
    rng = np.random.default_rng(3)
    v, t, h, w, n = 2, 9, 32, 32, 5
    scene = [np.array(a) for a in make_scene(rng, v, t, h, w, n)]
    scene[2][:, 0] = 0.0  # all queries start at frame 0
    torch_traj, torch_vis, params = run_reference(scene, CFG, iters=2)
    return tuple(scene), params, torch_traj, torch_vis


def test_parameter_tree_matches(parity_case):
    import jax
    import jax.numpy as jnp

    args, params, *_ = parity_case
    model = MVTracker(**CFG)
    ref_params = model.init(
        jax.random.PRNGKey(0), *[jnp.asarray(a) for a in args], iters=1
    )
    ref_shapes = jax.tree.map(lambda x: tuple(x.shape), ref_params)
    got_shapes = jax.tree.map(lambda x: tuple(np.asarray(x).shape), params)
    assert ref_shapes == got_shapes, "converted param tree mismatch"


def test_forward_parity(parity_case):
    import jax.numpy as jnp

    args, params, torch_traj, torch_vis = parity_case
    model = MVTracker(**CFG)
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, params)
        if False
        else {"params": jax.tree_util.tree_map(jnp.asarray, params["params"])},
        *[jnp.asarray(a) for a in args],
        iters=2,
    )
    ours_traj = np.asarray(out["traj"])
    ours_vis = np.asarray(out["vis"])

    # Coordinates: tight agreement (both fp32, same math).
    err = np.abs(ours_traj - torch_traj)
    assert err.max() < 5e-2, f"traj mismatch: max {err.max()}, mean {err.mean()}"
    np.testing.assert_allclose(ours_vis, torch_vis, atol=5e-2)


import jax  # noqa: E402  (used inside tests)

from tests.reference_compat import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo snapshot not present"
)


def test_forward_parity_late_start_queries():
    """Window anchoring + chaining parity: min(query_t) > 0 and queries
    spread over several windows (the reference anchors its sliding windows
    at the earliest query time, `mvtracker.py:531`, and chains every point
    processed by a previous window, `mvtracker.py:648-655`)."""
    rng = np.random.default_rng(11)
    v, t, h, w, n = 2, 16, 32, 32, 6
    scene = [np.array(a) for a in make_scene(rng, v, t, h, w, n)]
    # Earliest query at t=2 (anchor), others spread into later windows.
    scene[2][:, 0] = np.array([2.0, 2.0, 4.0, 7.0, 10.0, 13.0])
    torch_traj, torch_vis, params = run_reference(scene, CFG, iters=2)
    ours_traj, ours_vis = run_ours(scene, CFG, 2, params)

    err = np.abs(ours_traj - torch_traj)
    assert err.max() < 1e-2, f"traj mismatch: max {err.max()}, mean {err.mean()}"
    np.testing.assert_allclose(ours_vis, torch_vis, atol=1e-2)


def test_forward_parity_filter_invalid_depth():
    """corr_filter_invalid_depth parity. The reference compacts the cloud
    and then gathers from UNcompacted arrays with compacted indices
    (`mvtracker.py:820-829`) — an index-misalignment bug unless the invalid
    points form a suffix of the flattened cloud; our sentinel-coordinate
    design fixes it. The test zeroes depth only in the bottom half of the
    LAST view so invalid points ARE a suffix at every pyramid level and the
    reference's gather is well-defined."""
    rng = np.random.default_rng(12)
    v, t, h, w, n = 2, 9, 32, 32, 4
    scene = [np.array(a) for a in make_scene(rng, v, t, h, w, n)]
    scene[2][:, 0] = 0.0
    scene[1][-1, :, h // 2 :, :] = 0.0  # invalid depth suffix in last view
    cfg = dict(CFG)
    torch_traj, torch_vis, params = run_reference(
        scene, cfg, iters=2, corr_filter_invalid_depth=True
    )
    ours_traj, ours_vis = run_ours(
        scene, cfg, 2, params, corr_filter_invalid_depth=True
    )
    err = np.abs(ours_traj - torch_traj)
    assert err.max() < 1e-2, f"traj mismatch: max {err.max()}, mean {err.mean()}"
    np.testing.assert_allclose(ours_vis, torch_vis, atol=1e-2)


def test_forward_parity_iters4_larger_config():
    """Closer-to-flagship dims (fmaps 64, hidden 128, 3+3 depth, S=8,
    4 groups) at iters=4, strided-style late queries."""
    cfg = dict(
        sliding_window_len=8,
        stride=4,
        fmaps_dim=64,
        num_heads=4,
        hidden_size=128,
        space_depth=3,
        time_depth=3,
        num_virtual_tracks=8,
        corr_n_levels=3,
        corr_neighbors=8,
        corr_n_groups=4,
    )
    rng = np.random.default_rng(13)
    v, t, h, w, n = 2, 12, 32, 32, 5
    scene = [np.array(a) for a in make_scene(rng, v, t, h, w, n)]
    scene[2][:, 0] = np.array([1.0, 1.0, 5.0, 8.0, 9.0])
    torch_traj, torch_vis, params = run_reference(scene, cfg, iters=4)
    ours_traj, ours_vis = run_ours(scene, cfg, 4, params)
    err = np.abs(ours_traj - torch_traj)
    assert err.max() < 1e-2, f"traj mismatch: max {err.max()}, mean {err.mean()}"
    np.testing.assert_allclose(ours_vis, torch_vis, atol=1e-2)



def test_convert_cli_roundtrip(tmp_path):
    """torch .pth -> msgpack -> loadable params that run the model."""
    import torch

    from mvtracker_tpu.cli.convert import load_converted, main as convert_main

    TorchMVT = load_reference_mvtracker()
    torch.manual_seed(1)
    tm = TorchMVT(use_flash_attention=False, **CFG)
    pth = str(tmp_path / "ref.pth")
    torch.save(tm.state_dict(), pth)
    out = str(tmp_path / "conv.msgpack")
    convert_main([pth, out])

    import jax.numpy as jnp

    model = MVTracker(**CFG)
    rng = np.random.default_rng(0)
    args = [jnp.asarray(a) for a in make_scene(rng, v=2, t=6, h=32, w=32, n=4)]
    params = load_converted(out, model, args, iters=1)
    o = model.apply(params, *args, iters=1)
    assert np.isfinite(np.asarray(o["traj"])).all()
