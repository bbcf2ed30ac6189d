"""Every shipped config preset must load, build its model family, and (at
reduced dims) run forward through the evaluation predictor — the smoke
contract of the reference's `configs/model/*.yaml` group."""

import glob
import os

import numpy as np
import pytest

from mvtracker_tpu.config import build_model, load_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "configs")
PRESETS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml")))

# Dim-shrinking overrides for forward smoke runs (CPU): the preset itself
# is loaded unmodified first; the forward pass runs the same family at
# test-size dims.
TINY = [
    "model.sliding_window_len=4",
    "model.fmaps_dim=16",
    "model.num_heads=2",
    "model.hidden_size=32",
    "model.space_depth=1",
    "model.time_depth=1",
    "model.num_virtual_tracks=4",
    "model.corr_n_levels=2",
    "model.corr_neighbors=4",
    "model.triplane_res=16",
    "model.compute_dtype=float32",
    "model.remat=false",
]


def test_presets_exist():
    assert len(PRESETS) >= 8, f"expected >= 8 presets, found {len(PRESETS)}"


@pytest.mark.parametrize("path", PRESETS, ids=[os.path.basename(p) for p in PRESETS])
def test_preset_loads_and_builds(path):
    cfg = load_config(path)
    model = build_model(cfg.model)
    assert model is not None


def _unique_family_presets():
    """One forward-smoke per model family: the monocular baseline zoo maps
    many preset names onto the same adapter-over-2D-tracker build (see
    `config.py::_MONOCULAR_BASELINES`), so smoking each name would re-run
    an identical forward N times for pure wall-clock cost. Load/build (the
    per-preset contract) still runs for every preset above."""
    seen, keep = set(), []
    for p in PRESETS:
        cfg = load_config(p)
        model = build_model(cfg.model)
        key = type(model).__name__
        if key == "MonocularToMultiViewAdapter":
            key += type(model.tracker_2d).__name__
        if key not in seen:
            seen.add(key)
            keep.append(p)
    return keep


SMOKE_PRESETS = _unique_family_presets()


@pytest.mark.parametrize(
    "path", SMOKE_PRESETS, ids=[os.path.basename(p) for p in SMOKE_PRESETS]
)
def test_preset_family_forward_smoke(path):
    """Forward smoke: the preset's model family tracks a tiny synthetic
    scene end-to-end through the EvaluationPredictor."""
    import jax

    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from tests.test_model import make_scene

    cfg = load_config(path, TINY)
    model = build_model(cfg.model)

    rng = np.random.default_rng(0)
    v = 1 if "monocular" in os.path.basename(path) else 2
    scene = make_scene(rng, v=v, t=6, h=32, w=32, n=4)
    rgbs, depths, query, intrs, extrs = scene

    params = None
    if hasattr(model, "init"):
        params = jax.jit(lambda k: model.init(k, rgbs, depths, query, intrs, extrs, iters=1))(
            jax.random.PRNGKey(0)
        )
    predictor = EvaluationPredictor(
        model, params, interp_shape=None, grid_size=0, n_iters=1
    )
    out = predictor(rgbs, depths, query, intrs, extrs)
    assert np.asarray(out["traj"]).shape == (6, 4, 3)
    assert np.asarray(out["vis"]).shape == (6, 4)
    assert np.isfinite(np.asarray(out["traj"])).all()
