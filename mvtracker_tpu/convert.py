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


# ---------------------------------------------------------------------------
# VGGT-1B conversion (facebook/VGGT -> models/vggt.py)
# ---------------------------------------------------------------------------


def _ln(sd, name):
    return {
        "scale": np.asarray(sd[f"{name}.weight"]),
        "bias": np.asarray(sd[f"{name}.bias"]),
    }


def _deconv(sd, name):
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, I, O) with SPATIALLY FLIPPED taps: torch's op is the gradient
    of a correlation while flax's (transpose_kernel=False) is a
    fractionally-strided correlation, so the taps land mirrored; flipping
    kh/kw makes the two ops numerically identical (pinned by
    tests/test_vggt_convert.py::test_deconv_mapping_matches_torch)."""
    w = np.asarray(sd[f"{name}.weight"])
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 0, 1)[::-1, ::-1])}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _vggt_block(sd, prefix, qk_norm):
    """Reference `layers/block.py` Block -> flax VGGTBlock params."""
    attn = {
        "qkv": _dense(sd, f"{prefix}.attn.qkv"),
        "proj": _dense(sd, f"{prefix}.attn.proj"),
    }
    if qk_norm:
        attn["q_norm"] = _ln(sd, f"{prefix}.attn.q_norm")
        attn["k_norm"] = _ln(sd, f"{prefix}.attn.k_norm")
    return {
        "norm1": _ln(sd, f"{prefix}.norm1"),
        "attn": attn,
        "ls1": np.asarray(sd[f"{prefix}.ls1.gamma"]),
        "norm2": _ln(sd, f"{prefix}.norm2"),
        "mlp_fc1": _dense(sd, f"{prefix}.mlp.fc1"),
        "mlp_fc2": _dense(sd, f"{prefix}.mlp.fc2"),
        "ls2": np.asarray(sd[f"{prefix}.ls2.gamma"]),
    }


def _dpt_head(sd, p):
    """Reference `heads/dpt_head.py` DPTHead -> flax DPTHead params."""
    out = {"norm": _ln(sd, f"{p}.norm")}
    for li in range(4):
        out[f"project_{li}"] = _conv(sd, f"{p}.projects.{li}")
        # scratch.layer{1..4}_rn 3x3 convs are bias-free (_make_scratch).
        out[f"scratch_{li}"] = _conv(sd, f"{p}.scratch.layer{li + 1}_rn")
    out["resize_0"] = _deconv(sd, f"{p}.resize_layers.0")
    out["resize_1"] = _deconv(sd, f"{p}.resize_layers.1")
    out["resize_3"] = _conv(sd, f"{p}.resize_layers.3")
    for li in range(1, 5):
        t = f"{p}.scratch.refinenet{li}"
        blk = {}
        if f"{t}.resConfUnit1.conv1.weight" in sd:
            blk["res1_conv1"] = _conv(sd, f"{t}.resConfUnit1.conv1")
            blk["res1_conv2"] = _conv(sd, f"{t}.resConfUnit1.conv2")
        blk["res2_conv1"] = _conv(sd, f"{t}.resConfUnit2.conv1")
        blk["res2_conv2"] = _conv(sd, f"{t}.resConfUnit2.conv2")
        blk["out_conv"] = _conv(sd, f"{t}.out_conv")
        out[f"refine{li}"] = blk
    out["out_conv1"] = _conv(sd, f"{p}.scratch.output_conv1")
    out["out_conv2a"] = _conv(sd, f"{p}.scratch.output_conv2.0")
    out["out_conv2b"] = _conv(sd, f"{p}.scratch.output_conv2.2")
    return out


def convert_vggt_state_dict(sd: Mapping[str, "np.ndarray"]) -> dict:
    """Torch VGGT state_dict (facebook/VGGT-1B layout, as instantiated by the
    reference's vendored copy `mvtracker/models/core/vggt/models/vggt.py`)
    -> flax params for `mvtracker_tpu.models.vggt.VGGT`.

    Depths are inferred from the keys. Unconsumed reference parts, by
    design: `track_head.*` (the tracking capability lives in this repo's
    own MVTracker), `aggregator.patch_embed.mask_token` (masked-image
    pretraining leftover, unused at inference), and the `_resnet_mean/std`
    buffers (constants, baked into the flax forward).
    """
    import re

    sd = {k: np.asarray(v) for k, v in sd.items()}
    # Chunked DINO block names (`blocks.{chunk}.{global_i}.`) -> flat.
    sd = {
        re.sub(r"(patch_embed\.blocks)\.\d+\.(\d+)\.", r"\1.\2.", k): v
        for k, v in sd.items()
    }

    def _count(pattern):
        hits = {
            int(re.match(pattern, k).group(1))
            for k in sd
            if re.match(pattern, k)
        }
        return max(hits) + 1 if hits else 0

    agg_depth = _count(r"aggregator\.frame_blocks\.(\d+)\.")
    vit_depth = _count(r"aggregator\.patch_embed\.blocks\.(\d+)\.")
    trunk_depth = _count(r"camera_head\.trunk\.(\d+)\.")

    agg = {
        "camera_token": sd["aggregator.camera_token"][0],  # [2, 1, C]
        "register_token": sd["aggregator.register_token"][0],  # [2, R, C]
    }
    for i in range(agg_depth):
        agg[f"frame_{i}"] = _vggt_block(
            sd, f"aggregator.frame_blocks.{i}", qk_norm=True
        )
        agg[f"global_{i}"] = _vggt_block(
            sd, f"aggregator.global_blocks.{i}", qk_norm=True
        )
    if vit_depth:
        vit = {
            "proj": _conv(sd, "aggregator.patch_embed.patch_embed.proj"),
            "cls_token": sd["aggregator.patch_embed.cls_token"],
            "pos_embed": sd["aggregator.patch_embed.pos_embed"],
            "register_tokens": sd["aggregator.patch_embed.register_tokens"],
            "norm": _ln(sd, "aggregator.patch_embed.norm"),
        }
        for i in range(vit_depth):
            vit[f"block_{i}"] = _vggt_block(
                sd, f"aggregator.patch_embed.blocks.{i}", qk_norm=False
            )
        agg["patch_vit"] = vit
    else:  # conv patchify variant
        agg["patch_embed"] = _conv(sd, "aggregator.patch_embed.proj")

    cam = {
        "token_norm": _ln(sd, "camera_head.token_norm"),
        "trunk_norm": _ln(sd, "camera_head.trunk_norm"),
        "empty_pose_tokens": sd["camera_head.empty_pose_tokens"],
        "embed_pose": _dense(sd, "camera_head.embed_pose"),
        # Sequential(SiLU, Linear): the Linear is index 1.
        "pose_modulation": _dense(sd, "camera_head.poseLN_modulation.1"),
        "pose_branch_fc1": _dense(sd, "camera_head.pose_branch.fc1"),
        "pose_branch_fc2": _dense(sd, "camera_head.pose_branch.fc2"),
    }
    for d in range(trunk_depth):
        cam[f"trunk_{d}"] = _vggt_block(sd, f"camera_head.trunk.{d}", qk_norm=False)

    params = {
        "aggregator": agg,
        "camera_head": cam,
        "depth_head": _dpt_head(sd, "depth_head"),
        "point_head": _dpt_head(sd, "point_head"),
    }
    return {"params": params}


def load_vggt_checkpoint(path: str) -> dict:
    """Load a VGGT torch checkpoint (.pt/.pth/.bin) and convert it."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and not any(
        k.startswith("aggregator") for k in ckpt
    ):
        ckpt = ckpt["model"]
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in ckpt.items()}
    return convert_vggt_state_dict(sd)
