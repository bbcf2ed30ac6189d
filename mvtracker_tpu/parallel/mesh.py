"""Device mesh + sharding helpers.

The reference's only parallelism is DDP gradient all-reduce over NCCL
(`mvtracker/cli/train.py:358-365`). The TPU build goes further (SURVEY.md
§2.6): a 2D mesh with axes

- ``data``  — scenes (batch) are sharded here; gradient sync is XLA's
  reduce-scatter/all-reduce inserted by pjit over ICI/DCN;
- ``model`` — intra-scene work: views during encoding (each device encodes a
  subset of the V camera streams), and track blocks during refinement.

Shardings are expressed declaratively; XLA's SPMD partitioner inserts the
collectives (all-gather of the fused cloud before kNN, reduce-scatter of
gradients, etc.).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, f"{n_data}x{n_model} != {n} devices"
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (scene) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_pytree(batch, mesh: Mesh):
    """Device-put every leaf with its leading axis over the data mesh axis.

    Single-process: a plain sharded device_put. Multi-host: each process
    holds only ITS slice of the global batch (the loader stripes scenes per
    process, `datasets/loader.py::PrefetchLoader(process_index=...)`), so
    the global array is assembled from process-local shards — device_put
    cannot place host data onto non-addressable devices.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(to_global, batch)
