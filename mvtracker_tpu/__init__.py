"""mvtracker_tpu: a TPU-native multi-view 3D point-tracking framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference MVTracker system (ETH-VLG "Multi-View 3D Point Tracking",
arXiv 2508.21060, plus its DROID robot-data factory fork).

Layers (mirroring the reference's decomposition, re-architected TPU-first):

- ``utils``       — geometry core: camera math, projections, embeddings (L0)
- ``ops``         — hot ops: batched kNN, grouped correlation, splatting (L1)
- ``models``      — feature encoder, update transformer, trackers (L2-L3)
- ``datasets``    — Datapoint schema, Kubric/Panoptic/DexYCB/TapVid loaders (L4)
- ``evaluation``  — TAP-Vid-style 3D metrics + evaluator loop (L5-L6)
- ``training``    — losses, optax train step, orbax checkpoints (L7)
- ``parallel``    — mesh/sharding utilities for multi-chip scale-out
- ``viz``         — mp4 track-overlay rendering (L9)
- ``droid``       — DROID robot episode data factory (L11)

Everything in the compute path is static-shaped, jit-compatible, and designed
for `jax.sharding.Mesh` SPMD execution over TPU ICI/DCN.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache (repo-local by default).

    The flagship graphs take minutes to compile cold; the cache makes every
    subsequent process start in seconds. Called by the CLIs/bench.
    """
    import os

    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
