"""Measure the knn_sharded (all-gather merge) vs knn_sharded_ring
(ppermute ring) crossover on a virtual 8-device CPU mesh.

The two collective schedules trade interconnect traffic differently
(see `ops/knn.py` docstrings):

- all-gather merge moves every shard's k candidates to every device:
  O(D * B * M * k) gather buffer;
- ring moves one cloud shard (B * N/D * 3 floats) per step on a
  neighbor link, D-1 times, and re-runs the local kNN kernel D times.

Crossover intuition: ring wins when M*k (candidate volume) outweighs
N/D (shard volume); all-gather wins in the opposite regime. CPU-mesh
timings are not ICI timings, but the relative compute cost (D local
kNN passes for the ring vs 1 for the merge) and the buffer sizes are
architecture-independent; treat the printed table as the shape of the
tradeoff, not absolute device numbers.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/profile_sharded_knn.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mvtracker_tpu.ops.knn import knn_sharded, knn_sharded_ring


def bench(fn, *args, reps=2):
    def force(o):
        # A host value read is the only sync that cannot lie: on the
        # virtual-CPU-device mesh, block_until_ready has been observed to
        # return early for fully-replicated shard_map outputs.
        return float(jax.numpy.asarray(o[0]).sum())

    force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        force(fn(*args))
    return (time.perf_counter() - t0) / reps


def main():
    devices = np.array(jax.devices()[:8])
    d = len(devices)
    mesh = Mesh(devices, ("cloud",))
    rng = np.random.default_rng(0)

    print(f"{'N':>8} {'M':>6} {'k':>3} {'M*k':>7} {'N/D':>7} "
          f"{'gather ms':>10} {'ring ms':>9} winner")
    rows = []
    for n in (16_384, 131_072):
        for m in (256, 4096):
            for k in (16,):
                ref = jnp.asarray(rng.normal(size=(1, n, 3)), jnp.float32)
                qry = jnp.asarray(rng.normal(size=(1, m, 3)), jnp.float32)

                def run(kind):
                    fn = {"gather": knn_sharded, "ring": knn_sharded_ring}[kind]

                    @jax.jit
                    def sharded(r, q):
                        return jax.shard_map(
                            lambda rl, ql: fn(rl, ql, k, "cloud"),
                            mesh=mesh,
                            in_specs=(P(None, "cloud", None), P(None, None, None)),
                            out_specs=P(None, None, None),
                            check_vma=False,
                        )(r, q)

                    r_sh = jax.device_put(ref, NamedSharding(mesh, P(None, "cloud", None)))
                    q_sh = jax.device_put(qry, NamedSharding(mesh, P(None, None, None)))
                    return bench(sharded, r_sh, q_sh)

                tg = run("gather") * 1e3
                tr = run("ring") * 1e3
                winner = "gather" if tg < tr else "ring"
                rows.append((n, m, k, m * k, n // d, tg, tr, winner))
                print(f"{n:>8} {m:>6} {k:>3} {m * k:>7} {n // d:>7} "
                      f"{tg:>10.2f} {tr:>9.2f} {winner}")

    # Crossover summary: fraction of configs each side wins, split by the
    # M*k vs N/D predictor.
    agree = sum(
        1 for (_, _, _, mk, nd, tg, tr, w) in rows
        if (w == "ring") == (mk > nd)
    )
    print(f"\npredictor 'ring wins iff M*k > N/D' agrees on "
          f"{agree}/{len(rows)} configs")


if __name__ == "__main__":
    main()
