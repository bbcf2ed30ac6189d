"""kNN backend consistency tests (reference contract:
`mvtracker/mvtracker.py:26-90` — dists/idx [B, M, k] sorted ascending)."""

import jax.numpy as jnp
import numpy as np
import pytest

import mvtracker_tpu.ops as knn_mod


def brute_force(ref, query, k):
    d = np.linalg.norm(query[:, :, None, :] - ref[:, None, :, :], axis=-1)
    idx = np.argsort(d, axis=-1)[..., :k]
    dists = np.take_along_axis(d, idx, axis=-1)
    return dists, idx


@pytest.mark.parametrize("b,n,m,k", [(2, 100, 17, 4), (1, 500, 64, 16)])
def test_knn_reference_matches_numpy(rng, b, n, m, k):
    ref = rng.normal(size=(b, n, 3)).astype(np.float32)
    query = rng.normal(size=(b, m, 3)).astype(np.float32)
    d_np, i_np = brute_force(ref, query, k)
    d, i = knn_mod.knn.knn_reference(jnp.asarray(ref), jnp.asarray(query), k)
    np.testing.assert_allclose(np.asarray(d), d_np, atol=1e-3)
    # Indices may differ on ties; check the gathered points' distances agree.
    gathered = np.take_along_axis(
        np.linalg.norm(query[:, :, None, :] - ref[:, None, :, :], axis=-1),
        np.asarray(i),
        axis=-1,
    )
    np.testing.assert_allclose(gathered, d_np, atol=1e-3)


def test_knn_xla_chunked_matches_reference(rng):
    b, n, m, k = 2, 300, 1100, 8
    ref = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32))
    d0, i0 = knn_mod.knn.knn_reference(ref, query, k)
    d1, i1 = knn_mod.knn.knn_xla(ref, query, k, query_chunk=256)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)
    # Indices may differ on fp ties (per-chunk centering changes rounding);
    # the gathered points' distances must agree.
    gathered = np.take_along_axis(
        np.linalg.norm(
            np.asarray(query)[:, :, None] - np.asarray(ref)[:, None], axis=-1
        ),
        np.asarray(i1),
        axis=-1,
    )
    np.testing.assert_allclose(gathered, np.asarray(d0), atol=1e-4)


def test_knn_pallas_interpret_matches_reference(rng):
    b, n, m, k = 2, 700, 300, 16
    ref = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32))
    d0, _ = knn_mod.knn.knn_reference(ref, query, k)
    d1, i1 = knn_mod.knn.knn_pallas(ref, query, k, query_tile=128, ref_tile=512, interpret=True)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-3)
    # All returned indices must be in range.
    assert int(jnp.max(i1)) < n
    assert int(jnp.min(i1)) >= 0


def test_knn_k1_feature_init_case(rng):
    """k=1 is the query feature-initialization path
    (reference `mvtracker/mvtracker.py:636-643`)."""
    b, n, m = 1, 200, 30
    ref = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    query = ref[:, 5:35] + 1e-4  # queries sit (almost) on known points
    d, i = knn_mod.knn.knn(ref, query, 1)
    np.testing.assert_array_equal(np.asarray(i[0, :, 0]), np.arange(5, 35))


def test_knn_far_from_origin(rng):
    """Distance computation must survive scenes far from the origin (the
    |q|^2-2qr+|r|^2 expansion cancels catastrophically without centering;
    on TPU the default bf16 matmul makes it worse — both are fixed by
    query-centering + HIGHEST precision)."""
    b, n, m, k = 1, 400, 50, 8
    offset = np.asarray([100.0, -50.0, 200.0], np.float32)
    ref = (rng.normal(size=(b, n, 3)) * 0.1 + offset).astype(np.float32)
    query = (rng.normal(size=(b, m, 3)) * 0.1 + offset).astype(np.float32)
    d_np, _ = brute_force(ref, query, k)
    d1, _ = knn_mod.knn.knn_xla(jnp.asarray(ref), jnp.asarray(query), k)
    np.testing.assert_allclose(np.asarray(d1), d_np, atol=1e-3)
    d2, _ = knn_mod.knn.knn_pallas(
        jnp.asarray(ref), jnp.asarray(query), k, query_tile=64, ref_tile=128, interpret=True
    )
    np.testing.assert_allclose(np.asarray(d2), d_np, atol=1e-3)


def test_knn_sharded_matches_global(rng):
    """Distributed top-k merge over a sharded cloud == global kNN."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    b, n, m, k = 1, 512, 40, 8
    ref = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32))

    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("cloud",))

    f = shard_map(
        lambda r, q: knn_mod.knn.knn_sharded(r, q, k, "cloud", backend="xla"),
        mesh=mesh,
        in_specs=(P(None, "cloud", None), P(None, None, None)),
        out_specs=(P(None, None, None), P(None, None, None)),
        check_vma=False,
    )
    d_sh, i_sh = f(ref, query)
    d_ref, i_ref = knn_mod.knn.knn_reference(ref, query, k)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-4)
    # Gathered distances at the returned indices agree (ties may reorder).
    dist_full = np.linalg.norm(
        np.asarray(query)[:, :, None] - np.asarray(ref)[:, None], axis=-1
    )
    gathered = np.take_along_axis(dist_full, np.asarray(i_sh), axis=-1)
    np.testing.assert_allclose(np.sort(gathered), np.sort(np.asarray(d_ref)), atol=1e-4)


def test_knn_sharded_ring_matches_global(rng):
    """Ring-permute distributed kNN == global kNN (same contract as the
    all-gather merge variant, different collective schedule)."""
    import jax
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    b, n, m, k = 1, 512, 40, 8
    ref = jnp.asarray(rng.normal(size=(b, n, 3)).astype(np.float32))
    query = jnp.asarray(rng.normal(size=(b, m, 3)).astype(np.float32))

    devices = np.asarray(jax.devices()[:4])
    mesh = Mesh(devices, ("cloud",))

    f = shard_map(
        lambda r, q: knn_mod.knn.knn_sharded_ring(r, q, k, "cloud", backend="xla"),
        mesh=mesh,
        in_specs=(P(None, "cloud", None), P(None, None, None)),
        out_specs=(P(None, None, None), P(None, None, None)),
        check_vma=False,
    )
    d_sh, i_sh = f(ref, query)
    d_ref, i_ref = knn_mod.knn.knn_reference(ref, query, k)
    np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref), atol=1e-4)
    dist_full = np.linalg.norm(
        np.asarray(query)[:, :, None] - np.asarray(ref)[:, None], axis=-1
    )
    gathered = np.take_along_axis(dist_full, np.asarray(i_sh), axis=-1)
    np.testing.assert_allclose(np.sort(gathered), np.sort(np.asarray(d_ref)), atol=1e-4)


def test_knn_k_exceeds_cloud_fill_contract(rng):
    """k > N: every backend returns [.., k] with ranks >= N filled by huge
    distances (the small-pyramid-level contract the model's rank-wrap
    depends on, `models/mvtracker.py::_corr_features`). lax.top_k would
    raise without the explicit pad in knn_reference/knn_xla."""
    ref = rng.normal(size=(1, 5, 3)).astype(np.float32)
    q = rng.normal(size=(1, 7, 3)).astype(np.float32)
    for backend in ("reference", "xla"):
        d, i = knn_mod.knn.knn(jnp.asarray(ref), jnp.asarray(q), 8, backend=backend)
        assert d.shape == (1, 7, 8) and i.shape == (1, 7, 8)
        bf_d, bf_i = brute_force(ref, q, 5)
        np.testing.assert_allclose(np.asarray(d)[..., :5], bf_d, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(i)[..., :5], bf_i)
        assert (np.asarray(d)[..., 5:] > 1e8).all()
        assert (np.asarray(i)[..., 5:] < 5).all()  # in-range placeholder


def test_knn_banished_outlier_queries_do_not_corrupt_real_rows(rng):
    """The dynamic3dgs banish pattern: moderate-magnitude sentinel slots
    interleaved with real points (a sentinel leading the query batch) must
    not corrupt real rows' neighborhoods through the shared centering.
    This is the kNN precision contract (`ops/knn.py::_sq_dists`): at the
    old 1e6 banish magnitude ~half the neighbors came back wrong."""
    c = 96
    real = rng.normal(size=(c, 3)).astype(np.float32)
    is_fg = rng.random(c) > 0.3
    is_fg[0] = False  # a banished slot leads the batch -> it is the center
    banish = (100.0 + 1e-3 * np.arange(c, dtype=np.float32))[:, None] * np.ones((1, 3), np.float32)
    pts = np.where(is_fg[:, None], real, banish)

    d, i = knn_mod.knn.knn(jnp.asarray(pts[None]), jnp.asarray(pts[None]), 5, backend="xla")
    i = np.asarray(i)[0]

    bf_d, bf_i = brute_force(
        pts[None].astype(np.float64), pts[None].astype(np.float64), 5
    )
    # Real rows must match fp64 brute force as SETS per row (fp32 can
    # legitimately swap the order of near-tied neighbors).
    rows = np.flatnonzero(is_fg)
    overlap = np.mean(
        [len(set(i[r]) & set(bf_i[0][r])) / 5.0 for r in rows]
    )
    assert overlap > 0.99, overlap
