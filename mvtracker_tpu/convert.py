"""Reference-checkpoint conversion: torch MVTracker state_dict -> flax params.

Lets users of the reference load its released weights
(`mvtracker_200000_june2025.pth`, reference `explainers/README_MVTRacker.md:195`)
directly into this framework's MVTracker. The mapping is purely mechanical
because the architectures match layer-for-layer:

    torch Conv2d  (O, I, kh, kw)  ->  flax Conv kernel (kh, kw, I, O)
    torch Linear  (O, I)          ->  flax Dense kernel (I, O)
    GroupNorm(1, C)               ->  LayerNorm scale/bias

Verified numerically by `tests/test_reference_parity.py`: a randomly
initialized reference torch model and this model produce matching tracks
after conversion.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _conv(sd, name):
    w = np.asarray(sd[f"{name}.weight"])
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _dense(sd, name):
    out = {"kernel": np.asarray(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _residual_block(sd, prefix):
    out = {"conv1": _conv(sd, f"{prefix}.conv1"), "conv2": _conv(sd, f"{prefix}.conv2")}
    if f"{prefix}.downsample.0.weight" in sd:
        out["downsample"] = _conv(sd, f"{prefix}.downsample.0")
    return out


def _attention(sd, prefix):
    return {
        "to_q": _dense(sd, f"{prefix}.to_q"),
        "to_kv": _dense(sd, f"{prefix}.to_kv"),
        "to_out": _dense(sd, f"{prefix}.to_out"),
    }


def _mlp(sd, prefix):
    return {"fc1": _dense(sd, f"{prefix}.fc1"), "fc2": _dense(sd, f"{prefix}.fc2")}


def _attn_block(sd, prefix):
    return {"attn": _attention(sd, f"{prefix}.attn"), "mlp": _mlp(sd, f"{prefix}.mlp")}


def _cross_attn_block(sd, prefix):
    return {
        "cross_attn": _attention(sd, f"{prefix}.cross_attn"),
        "mlp": _mlp(sd, f"{prefix}.mlp"),
        "norm_context": {
            "scale": np.asarray(sd[f"{prefix}.norm_context.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm_context.bias"]),
        },
    }


def _tree_stack(trees: list[dict]) -> dict:
    """Stack a list of identical-structure nested dicts of arrays on axis 0."""
    out = {}
    for k, v in trees[0].items():
        if isinstance(v, dict):
            out[k] = _tree_stack([t[k] for t in trees])
        else:
            out[k] = np.stack([t[k] for t in trees])
    return out


def convert_reference_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Torch state_dict (tensors or arrays) -> flax params dict for MVTracker.

    Block depths are inferred from the state-dict keys.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def _depth(prefix):
        idxs = {
            int(k[len(prefix):].split(".")[1])
            for k in sd
            if k.startswith(prefix)
        }
        return max(idxs) + 1 if idxs else 0

    time_depth = _depth("updateformer.time_blocks")
    space_depth = _depth("updateformer.space_virtual_blocks")

    fnet = {
        "conv1": _conv(sd, "fnet.conv1"),
        "conv2": _conv(sd, "fnet.conv2"),
        "conv3": _conv(sd, "fnet.conv3"),
    }
    for layer, torch_layer in (
        ("layer1", "fnet.layer1"),
        ("layer2", "fnet.layer2"),
        ("layer3", "fnet.layer3"),
        ("layer4", "fnet.layer4"),
    ):
        fnet[f"{layer}_0"] = _residual_block(sd, f"{torch_layer}.0")
        fnet[f"{layer}_1"] = _residual_block(sd, f"{torch_layer}.1")

    uf = {
        "input_transform": _dense(sd, "updateformer.input_transform"),
        # sic: the reference misspells the parameter ("virual_tracks").
        "virtual_tracks": np.asarray(sd["updateformer.virual_tracks"]),
    }
    if space_depth > 0 and time_depth == space_depth:
        # 1:1 time/space interleave -> the model scans ONE stacked layer
        # (`updateformer.py::_UpdateLayer`): stack per-depth trees on axis 0.
        layers = [
            {
                "time": _attn_block(sd, f"updateformer.time_blocks.{i}"),
                "sv2p": _cross_attn_block(
                    sd, f"updateformer.space_virtual2point_blocks.{i}"
                ),
                "svirt": _attn_block(sd, f"updateformer.space_virtual_blocks.{i}"),
                "sp2v": _cross_attn_block(
                    sd, f"updateformer.space_point2virtual_blocks.{i}"
                ),
            }
            for i in range(time_depth)
        ]
        uf["layers"] = _tree_stack(layers)
    else:
        for i in range(time_depth):
            uf[f"time_{i}"] = _attn_block(sd, f"updateformer.time_blocks.{i}")
        for j in range(space_depth):
            uf[f"sv2p_{j}"] = _cross_attn_block(
                sd, f"updateformer.space_virtual2point_blocks.{j}"
            )
            uf[f"svirt_{j}"] = _attn_block(sd, f"updateformer.space_virtual_blocks.{j}")
            uf[f"sp2v_{j}"] = _cross_attn_block(
                sd, f"updateformer.space_point2virtual_blocks.{j}"
            )
    for fi, ti in ((0, 0), (1, 2), (2, 4)):
        uf[f"flow_head_{fi}"] = _dense(sd, f"updateformer.flow_head.{ti}")

    params = {
        "fnet": fnet,
        "updateformer": uf,
        "ffeats_norm": {
            "scale": np.asarray(sd["ffeats_norm.weight"]),
            "bias": np.asarray(sd["ffeats_norm.bias"]),
        },
        "ffeats_updater": _dense(sd, "ffeats_updater.0"),
        "vis_predictor": _dense(sd, "vis_predictor.0"),
    }
    return {"params": params}


def load_reference_checkpoint(path: str) -> dict:
    """Load a reference .pth checkpoint file and convert it.

    Handles both raw state_dicts and training checkpoints that nest the
    model under 'model' (reference `cli/train.py:603-620`).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and not any(
        k.startswith("fnet") for k in ckpt
    ):
        ckpt = ckpt["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in ckpt.items()}
    return convert_reference_state_dict(sd)
