"""Serialized point transformer (PTv3-equivalent) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mvtracker_tpu.models.point_transformer import (
    SerializedPointTransformer,
    morton_code,
)


def test_morton_locality(rng):
    """Points close in space should (mostly) be close in z-order."""
    pts = rng.uniform(0, 1, size=(512, 3)).astype(np.float32)
    keys = np.asarray(morton_code(jnp.asarray(pts)))
    order = np.argsort(keys)
    sorted_pts = pts[order]
    # Mean distance between serialized neighbors must be much smaller than
    # between random pairs.
    neighbor_d = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
    random_d = np.linalg.norm(
        sorted_pts[rng.permutation(512)] - sorted_pts, axis=1
    ).mean()
    assert neighbor_d < random_d * 0.5


def test_morton_order_permutation(rng):
    pts = jnp.asarray(rng.uniform(0, 1, size=(64, 3)).astype(np.float32))
    k1 = morton_code(pts, order=(0, 1, 2))
    k2 = morton_code(pts, order=(2, 0, 1))
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))


def test_transformer_shapes_and_grad(rng):
    model = SerializedPointTransformer(dim=32, depth=2, num_heads=2, group_size=64)
    xyz = jnp.asarray(rng.normal(size=(300, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), xyz, feats)
    out = model.apply(params, xyz, feats)
    assert out.shape == (300, 16)
    assert np.isfinite(np.asarray(out)).all()

    g = jax.grad(lambda p: jnp.sum(model.apply(p, xyz, feats) ** 2))(params)
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree.leaves(g))
    assert total > 0


def test_permutation_consistency(rng):
    """Serialization must undo itself: permuting the input points permutes
    the output identically (order-equivariance)."""
    model = SerializedPointTransformer(dim=32, depth=2, num_heads=2, group_size=32)
    xyz = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), xyz, feats)
    out1 = model.apply(params, xyz, feats)

    perm = rng.permutation(128)
    out2 = model.apply(params, xyz[perm], feats[perm])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1)[perm], atol=2e-4)


def test_mvtracker_with_point_transformer(rng):
    from mvtracker_tpu.models.mvtracker import MVTracker
    from tests.test_model import make_scene

    model = MVTracker(
        sliding_window_len=4,
        fmaps_dim=16,
        num_heads=2,
        hidden_size=32,
        space_depth=1,
        time_depth=1,
        num_virtual_tracks=4,
        corr_n_levels=2,
        corr_neighbors=4,
        use_point_transformer=True,
        point_transformer_depth=1,
    )
    args = make_scene(np.random.default_rng(0), v=2, t=4, h=32, w=32, n=4)
    params = model.init(jax.random.PRNGKey(0), *args, iters=1)
    out = model.apply(params, *args, iters=1)
    assert out["traj"].shape == (4, 4, 3)
    assert np.isfinite(np.asarray(out["traj"])).all()


def test_padding_rows_do_not_leak_into_attention(rng):
    """With P < group_size (one padded group), the block must equal plain
    attention over just the real rows — zero-pad rows used to contribute
    bias-derived keys/values."""
    import jax

    from mvtracker_tpu.models.point_transformer import SerializedAttentionBlock

    p, c, g = 40, 32, 128
    x = rng.normal(size=(p, c)).astype(np.float32)
    blk = SerializedAttentionBlock(dim=c, group_size=g)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out_padded = blk.apply(params, jnp.asarray(x))

    blk_tight = SerializedAttentionBlock(dim=c, group_size=p)  # no padding
    out_tight = blk_tight.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out_padded), np.asarray(out_tight), atol=1e-5
    )
