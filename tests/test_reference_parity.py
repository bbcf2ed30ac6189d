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


@pytest.fixture(scope="module")
def parity_case():
    import torch

    TorchMVT = load_reference_mvtracker()
    torch.manual_seed(0)
    tm = TorchMVT(use_flash_attention=False, **CFG).eval()

    rng = np.random.default_rng(3)
    v, t, h, w, n = 2, 9, 32, 32, 5
    rgbs, depths, query, intrs, extrs = [np.array(a) for a in make_scene(rng, v, t, h, w, n)]
    query[:, 0] = 0.0  # all queries start at frame 0 (the reference anchors
    # its sliding windows at min(query_t); ours anchor at 0 — equal here)

    with torch.no_grad():
        out = tm(
            rgbs=torch.from_numpy(rgbs.transpose(0, 1, 4, 2, 3)[None]).float(),
            depths=torch.from_numpy(depths[:, :, None][None]).float(),
            query_points=torch.from_numpy(query[None]).float(),
            intrs=torch.from_numpy(intrs[None]).float(),
            extrs=torch.from_numpy(extrs[None]).float(),
            iters=2,
        )
    torch_traj = out["traj_e"][0].numpy()
    torch_vis = out["vis_e"][0].numpy()

    sd = {k: v_.numpy() for k, v_ in tm.state_dict().items()}
    params = convert_reference_state_dict(sd)
    return (rgbs, depths, query, intrs, extrs), params, torch_traj, torch_vis


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
