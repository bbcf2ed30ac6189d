"""LoFTR local-feature-transformer parity and support-memory wiring.

Parity targets: reference `mvtracker/models/core/loftr/linear_attention.py`
(exact math) and `transformer.py` (structure; the reference computes its
full attention in fp16 SDPA so tolerance is fp16-level there).
"""

import sys

import numpy as np
import pytest

from tests.reference_compat import reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo snapshot not present"
)


REF = "/root/reference"


def _ref_loftr():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from mvtracker.models.core.loftr.linear_attention import LinearAttention
    from mvtracker.models.core.loftr.transformer import LocalFeatureTransformer

    return LinearAttention, LocalFeatureTransformer


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_linear_attention_parity(rng):
    import torch

    from mvtracker_tpu.models.loftr import linear_attention

    LinearAttention, _ = _ref_loftr()
    b, l, s, h, d = 2, 7, 11, 4, 16
    q = rng.normal(size=(b, l, h, d)).astype(np.float32)
    k = rng.normal(size=(b, s, h, d)).astype(np.float32)
    v = rng.normal(size=(b, s, h, d)).astype(np.float32)
    qm = rng.random((b, l)) > 0.3
    km = rng.random((b, s)) > 0.3

    with torch.no_grad():
        ref = LinearAttention()(
            torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
            q_mask=torch.from_numpy(qm), kv_mask=torch.from_numpy(km),
        ).numpy()
    got = np.asarray(linear_attention(q, k, v, qm, km))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def _torch_layer_to_flax(sd, prefix):
    def w(name):
        return np.asarray(sd[f"{prefix}.{name}.weight"])

    return {
        "q_proj": {"kernel": w("q_proj").T},
        "k_proj": {"kernel": w("k_proj").T},
        "v_proj": {"kernel": w("v_proj").T},
        "merge": {"kernel": w("merge").T},
        "mlp_0": {"kernel": np.asarray(sd[f"{prefix}.mlp.0.weight"]).T},
        "mlp_1": {"kernel": np.asarray(sd[f"{prefix}.mlp.2.weight"]).T},
        "norm1": {
            "scale": np.asarray(sd[f"{prefix}.norm1.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm1.bias"]),
        },
        "norm2": {
            "scale": np.asarray(sd[f"{prefix}.norm2.weight"]),
            "bias": np.asarray(sd[f"{prefix}.norm2.bias"]),
        },
    }


def test_transformer_parity(rng):
    import torch

    from mvtracker_tpu.models.loftr import LocalFeatureTransformer

    _, RefLFT = _ref_loftr()
    d_model, nhead = 32, 4
    names = ["self", "cross", "self", "cross"]
    torch.manual_seed(0)
    ref = RefLFT({"d_model": d_model, "nhead": nhead, "layer_names": names}).eval()

    b, l, s = 2, 9, 6
    f0 = rng.normal(size=(b, l, d_model)).astype(np.float32)
    f1 = rng.normal(size=(b, s, d_model)).astype(np.float32)
    with torch.no_grad():
        r0, r1 = ref(torch.from_numpy(f0), torch.from_numpy(f1))

    sd = ref.state_dict()
    params = {
        f"layer_{i}": _torch_layer_to_flax(sd, f"layers.{i}")
        for i in range(len(names))
    }
    model = LocalFeatureTransformer(d_model, nhead=nhead, layer_names=tuple(names))
    g0, g1 = model.apply({"params": params}, f0, f1)
    # The reference computes full attention through fp16 SDPA
    # (`transformer.py:43-45`); fp16-level tolerance.
    np.testing.assert_allclose(np.asarray(g0), r0.numpy(), atol=2e-2, rtol=2e-2)
    np.testing.assert_allclose(np.asarray(g1), r1.numpy(), atol=2e-2, rtol=2e-2)


def test_linear_vs_full_shapes(rng):
    import jax

    from mvtracker_tpu.models.loftr import LocalFeatureTransformer

    f0 = rng.normal(size=(1, 12, 16)).astype(np.float32)
    f1 = rng.normal(size=(1, 5, 16)).astype(np.float32)
    for attn in ("full", "linear"):
        m = LocalFeatureTransformer(16, nhead=2, layer_names=("self", "cross"), attention=attn)
        p = m.init(jax.random.PRNGKey(0), f0, f1)
        g0, g1 = m.apply(p, f0, f1)
        assert g0.shape == f0.shape and g1.shape == f1.shape
        assert np.isfinite(np.asarray(g0)).all()


def test_support_memory_in_updateformer(rng):
    """support_memory_tokens > 0 adds the gnn bank and stays finite."""
    import jax

    from mvtracker_tpu.models.updateformer import EfficientUpdateFormer

    m = EfficientUpdateFormer(
        space_depth=2, time_depth=2, input_dim=24, hidden_size=32,
        num_heads=2, output_dim=7, num_virtual_tracks=4,
        support_memory_tokens=10,
    )
    x = rng.normal(size=(1, 6, 5, 24)).astype(np.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    assert "support_memory" in p["params"]
    assert p["params"]["support_memory"].shape == (1, 10, 32)
    y = m.apply(p, x)
    assert y.shape == (1, 6, 5, 7)
    assert np.isfinite(np.asarray(y)).all()
