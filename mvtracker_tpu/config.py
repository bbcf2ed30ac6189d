"""Config system (L8): dataclasses + YAML + dotted-key overrides.

Replaces the reference's Hydra stack (`configs/train.yaml`,
`configs/model/*.yaml`, `configs/experiment/*.yaml` — 17 model configs and
experiment overrides, reference SURVEY §5) with a dependency-light
equivalent: typed dataclasses, YAML files for named presets, and
`key.subkey=value` command-line overrides like Hydra's.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import yaml

from mvtracker_tpu.training.train import TrainConfig


@dataclasses.dataclass
class ModelConfig:
    """Mirrors the reference model group (`configs/model/mvtracker.yaml` and
    `mvtracker/mvtracker.py:94-128` defaults)."""

    name: str = "mvtracker"
    sliding_window_len: int = 12
    stride: int = 4
    fmaps_dim: int = 128
    add_space_attn: bool = True
    num_heads: int = 6
    hidden_size: int = 384
    space_depth: int = 6
    time_depth: int = 6
    num_virtual_tracks: int = 64
    corr_n_groups: int = 1
    corr_n_levels: int = 4
    corr_neighbors: int = 16
    corr_add_neighbor_offset: bool = True
    corr_add_neighbor_xyz: bool = False
    flow_embed_dim: int = 64
    knn_backend: str = "auto"
    compute_dtype: str = "float32"  # "bfloat16" for MXU conv/attention
    corr_filter_invalid_depth: bool = False
    corr_knn_reuse: bool = False  # one kNN per window (fast, approximate)
    corr_backend: str = "auto"
    # Visibility-head upgrades (round 3; defaults = reference parity).
    vis_geom_features: bool = False
    vis_head_hidden: int = 0
    transformer_scan_unroll: int = 2
    # LoFTR gnn bank size; None keeps each family's own default
    # (0 for MVTracker, 100 for the triplane SpaTracker).
    support_memory_tokens: Optional[int] = None
    use_point_transformer: bool = False
    point_transformer_depth: int = 2
    normalize_scene_in_fwd_pass: bool = False
    remat: bool = False
    # Learned 2D tracker family ("cotracker2d"): optional trained-weights
    # msgpack to restore (corr_patch_radius is shared with the triplane
    # variant below).
    checkpoint_2d: str = ""
    # Triplane variant (name == "spatracker_multiview") extras.
    triplane_res: int = 64
    corr_patch_radius: int = 3


@dataclasses.dataclass
class DataConfig:
    dataset: str = "synthetic"  # synthetic | kubric
    root: str = ""
    batch_size: int = 1
    num_workers: int = 4
    num_tracks: int = 256
    n_views: int = 4
    n_frames: int = 24
    height: int = 256
    width: int = 256
    view_subset: Optional[list] = None
    seed: int = 0


@dataclasses.dataclass
class EvalConfig:
    setting: str = "kubric-multiview"
    interp_shape: Optional[list] = None
    grid_size: int = 5
    n_grids_per_view: int = 1
    num_uniformly_sampled_pts: int = 0
    n_iters: int = 6
    visibility_threshold: float = 0.5
    max_sequences: Optional[int] = None


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    trainer: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    eval: EvalConfig = dataclasses.field(default_factory=EvalConfig)
    mesh_data: Optional[int] = None  # None = all devices on data axis
    mesh_model: int = 1
    shard_views: bool = False


def _apply(obj: Any, key: str, value: Any):
    parts = key.split(".")
    for p in parts[:-1]:
        obj = getattr(obj, p)
    leaf = parts[-1]
    if not hasattr(obj, leaf):
        raise KeyError(f"unknown config key: {key}")
    current = getattr(obj, leaf)
    if isinstance(current, bool):
        value = str(value).lower() in ("1", "true", "yes")
    elif isinstance(current, int) and not isinstance(value, bool):
        value = int(value)
    elif isinstance(current, float):
        value = float(value)
    elif current is None and isinstance(value, str):
        # Optional fields: infer the type from the literal ("50" -> 50).
        value = yaml.safe_load(value)
    setattr(obj, leaf, value)


def _merge_dict(cfg: Config, d: dict, prefix: str = ""):
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            _merge_dict(cfg, v, prefix=f"{key}.")
        else:
            _apply(cfg, key, v)


def load_config(
    yaml_path: Optional[str] = None, overrides: Optional[list[str]] = None
) -> Config:
    """Build a Config from an optional YAML preset + `k=v` overrides."""
    cfg = Config()
    if yaml_path:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        _merge_dict(cfg, data)
    for ov in overrides or []:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got: {ov}")
        k, v = ov.split("=", 1)
        _apply(cfg, k, yaml.safe_load(v))
    return cfg


def format_config_tree(cfg: Config) -> str:
    """Plain-text config tree (the reference pretty-prints its resolved
    Hydra config at startup, `cli/utils/rich_utils.py:18`)."""
    lines = ["config"]
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            lines.append(f"├── {f.name}")
            subfields = dataclasses.fields(v)
            for i, sf in enumerate(subfields):
                branch = "└──" if i == len(subfields) - 1 else "├──"
                lines.append(f"│   {branch} {sf.name}: {getattr(v, sf.name)}")
        else:
            lines.append(f"├── {f.name}: {v}")
    return "\n".join(lines)


def build_model(mc: ModelConfig):
    """Model-family dispatch (the reference's `configs/model/*.yaml` group)."""
    if mc.name == "copycat":
        from mvtracker_tpu.models.copycat import CopyCat

        return CopyCat()
    if mc.name in ("mvtracker", "spatracker_multiview"):
        if mc.name == "spatracker_multiview":
            from mvtracker_tpu.models.spatracker import MultiViewSpaTracker as cls
        else:
            from mvtracker_tpu.models.mvtracker import MVTracker as cls
        fields = {f.name for f in dataclasses.fields(cls) if f.name != "parent"}
        kwargs = {
            k: v
            for k, v in dataclasses.asdict(mc).items()
            # None = "keep the model family's own default" (e.g.
            # support_memory_tokens differs between MVTracker and the
            # triplane SpaTracker).
            if k in fields and k != "name" and v is not None
        }
        return cls(**kwargs)
    if mc.name == "cotracker2d":
        # The in-repo LEARNED 2D tracker (models/cotracker2d.py) through the
        # multi-view adapter — the trainable replacement for the reference's
        # hub-downloaded CoTracker wrappers. `checkpoint_2d` restores
        # trained weights (msgpack flax params); empty = random init.
        import dataclasses as _dc

        from mvtracker_tpu.models.cotracker2d import CoTracker2D, LearnedTracker2D
        from mvtracker_tpu.models.monocular import MonocularToMultiViewAdapter

        fields = {f.name for f in _dc.fields(CoTracker2D) if f.name != "parent"}
        kwargs = {
            k: v
            for k, v in dataclasses.asdict(mc).items()
            if k in fields and k != "name" and v is not None
        }
        model2d = CoTracker2D(**kwargs)
        params = None
        if mc.checkpoint_2d:
            import flax.serialization

            import jax

            with open(mc.checkpoint_2d, "rb") as f:
                raw = f.read()
            params = flax.serialization.msgpack_restore(raw)
            if "params" not in params:
                params = {"params": params}
            params = jax.tree.map(lambda x: x, params)
        return MonocularToMultiViewAdapter(LearnedTracker2D(model2d, params))
    if mc.name in _MONOCULAR_BASELINES:
        # The reference's monocular-baseline model zoo (cotracker1/2/3,
        # locotrack, scenetracker, delta, spatialtrackerv2, tapip3d,
        # spatracker_monocular — `configs/model/*.yaml`): every entry is a
        # 2D/monocular tracker lifted to the multi-view 3D API by
        # `MonocularToMultiViewAdapter` (reference
        # `monocular_baselines.py:604`). Hub-backed names go through the
        # wrapper layer (models/hub_baselines.py) when the checkpoint is
        # available (torch.hub cache, or any network); otherwise — and for
        # the names whose vendored repos are absent — the adapter runs
        # over the in-repo correlation tracker with a warning: same API,
        # same evaluator path, weights are the only difference.
        from mvtracker_tpu.models.monocular import (
            MonocularToMultiViewAdapter,
            SimpleNNTracker2D,
        )

        try:
            from mvtracker_tpu.models.hub_baselines import (
                load_monocular_hub_tracker,
            )

            tracker = load_monocular_hub_tracker(mc.name)
        except Exception as e:  # offline / repo missing / unknown entry
            import logging

            logging.warning(
                "monocular baseline %r unavailable (%s); falling back to "
                "the in-repo NCC tracker through the same adapter",
                mc.name, e,
            )
            tracker = SimpleNNTracker2D()
        return MonocularToMultiViewAdapter(tracker)
    raise ValueError(f"unknown model family: {mc.name}")


_MONOCULAR_BASELINES = (
    "cotracker1_offline", "cotracker1_online",
    "cotracker2_offline", "cotracker2_online",
    "cotracker3_offline", "cotracker3_online",
    "locotrack", "scenetracker", "delta", "spatialtrackerv2", "tapip3d",
    "spatracker_monocular", "monocular_nn",
)


def build_dataset(dc: DataConfig):
    if dc.dataset == "synthetic":
        from mvtracker_tpu.datasets.loader import SyntheticSceneDataset

        return SyntheticSceneDataset(
            n_scenes=64,
            seed=dc.seed,
            n_views=dc.n_views,
            n_frames=dc.n_frames,
            height=dc.height,
            width=dc.width,
            n_tracks=dc.num_tracks,
        )
    if dc.dataset == "kubric":
        from mvtracker_tpu.datasets.kubric import KubricMultiViewDataset

        return KubricMultiViewDataset(
            dc.root,
            view_subset=dc.view_subset,
            num_tracks=dc.num_tracks,
            seed=dc.seed,
        )
    if dc.dataset == "droid":
        # Processed DROID episodes (BASELINE config 4: training on a DROID
        # subset); see `datasets/droid.py` for the artifact layout.
        from mvtracker_tpu.datasets.droid import DroidEpisodeDataset

        return DroidEpisodeDataset(dc.root, max_frames=dc.n_frames or None)
    if "-multiview" in dc.dataset:
        # Dataset-name mini-DSL (reference `from_name` factories): e.g.
        # "kubric-multiview-v3-views0_1_2_3-noise2cm", "panoptic-multiview…".
        from mvtracker_tpu.datasets.real_world import dataset_from_name

        return dataset_from_name(dc.dataset, dc.root)
    raise ValueError(f"unknown dataset: {dc.dataset}")
