"""VGGT torch->flax weight conversion (VERDICT r2 #7).

The torch side is the REFERENCE's vendored VGGT implementation itself
(`/root/reference/mvtracker/models/core/vggt/`), instantiated at reduced
depth with the real DINOv2-ViT patch embed (`vit_small`), randomly
initialized — exactly the layout a downloaded VGGT-1B state dict has,
minus scale. The converted tree must match this repo's flax VGGT
parameter-for-parameter, and `estimate_depth_and_poses` must run from it.
"""

import numpy as np
import pytest

import jax

from mvtracker_tpu.convert import convert_vggt_state_dict
from mvtracker_tpu.models import vggt as vggt_lib
from tests.reference_compat import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference snapshot not present"
)


def test_deconv_mapping_matches_torch():
    """The DPT resize deconvs: torch ConvTranspose2d == flax ConvTranspose
    with spatially flipped kernels (the _deconv transform)."""
    import torch
    import torch.nn as tnn
    import flax.linen as nn
    import jax.numpy as jnp

    torch.manual_seed(0)
    for k, s in ((4, 4), (2, 2)):
        m = tnn.ConvTranspose2d(3, 5, kernel_size=k, stride=s)
        x = torch.randn(1, 3, 6, 6)
        with torch.no_grad():
            y_t = m(x).numpy()
        from mvtracker_tpu.convert import _deconv

        sd = {"m.weight": m.weight.detach().numpy(),
              "m.bias": m.bias.detach().numpy()}
        p = {"params": {kk: jnp.asarray(v) for kk, v in _deconv(sd, "m").items()}}
        fl = nn.ConvTranspose(5, (k, k), strides=(s, s))
        y_f = np.asarray(
            fl.apply(p, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        ).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(y_t, y_f, atol=1e-5)


def _torch_skeleton():
    """Reference Aggregator (dinov2_vits14_reg patch embed) + CameraHead +
    two DPTHeads at reduced depth; returns (state_dict, dims)."""
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import torch
    from mvtracker.models.core.vggt.models.aggregator import Aggregator
    from mvtracker.models.core.vggt.heads.camera_head import CameraHead
    from mvtracker.models.core.vggt.heads.dpt_head import DPTHead

    torch.manual_seed(0)
    embed_dim = 384  # vit_small's fixed width
    agg_depth = 4
    model = torch.nn.Module()
    model.aggregator = Aggregator(
        img_size=28, patch_size=14, embed_dim=embed_dim, depth=agg_depth,
        num_heads=8, num_register_tokens=4, patch_embed="dinov2_vits14_reg",
    )
    model.camera_head = CameraHead(dim_in=2 * embed_dim, trunk_depth=2)
    kw = dict(
        dim_in=2 * embed_dim, patch_size=14, features=32,
        out_channels=[32, 48, 64, 64], intermediate_layer_idx=[0, 1, 2, 3],
    )
    model.depth_head = DPTHead(output_dim=2, activation="exp", **kw)
    model.point_head = DPTHead(output_dim=4, activation="inv_log", **kw)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return sd, embed_dim, agg_depth


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flat(v, key))
        else:
            out[key] = tuple(np.shape(v))
    return out


def test_vggt_state_dict_maps_onto_flax_tree():
    sd, embed_dim, agg_depth = _torch_skeleton()
    converted = convert_vggt_state_dict(sd)

    cfg = vggt_lib.VGGTConfig(
        img_size=28, patch_size=14, embed_dim=embed_dim, depth=agg_depth,
        num_heads=8, num_register_tokens=4, camera_trunk_depth=2,
        dpt_features=32, dpt_out_channels=(32, 48, 64, 64),
        patch_embed="dinov2", vit_depth=12, vit_num_heads=6,
    )
    assert cfg.intermediate_layer_idx == (0, 1, 2, 3)
    model = vggt_lib.VGGT(cfg)
    images = np.random.default_rng(0).uniform(0, 1, (1, 2, 28, 28, 3)).astype(np.float32)
    ref_params = model.init(jax.random.PRNGKey(0), images)

    got = _flat(converted["params"])
    want = _flat(ref_params["params"])
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converted tree missing {len(missing)} leaves: {missing[:8]}"
    assert not extra, f"converted tree has {len(extra)} unknown leaves: {extra[:8]}"
    mismatched = [k for k in want if want[k] != got[k]]
    assert not mismatched, {k: (want[k], got[k]) for k in mismatched[:8]}

    # Every torch tensor is consumed except the documented leftovers.
    consumed_ok = ("track_head.", "patch_embed.mask_token", "_resnet_")
    n_skipped = sum(1 for k in sd if any(t in k for t in consumed_ok))
    # count of converted leaves == torch tensors minus skipped, with the
    # single shared DPT tap-norm counted once per head on both sides.
    assert len(got) == len(sd) - n_skipped

    # The converted weights actually run through the inference wrapper.
    depth, conf, extr, intr = vggt_lib.estimate_depth_and_poses(
        model, converted, images[0]
    )
    assert depth.shape == (2, 28, 28) and conf.shape == (2, 28, 28)
    assert extr.shape == (2, 3, 4) and intr.shape == (2, 3, 3)
    assert np.isfinite(depth).all() and np.isfinite(extr).all()
