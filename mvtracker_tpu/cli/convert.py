"""Checkpoint conversion CLI.

    python -m mvtracker_tpu.cli.convert reference.pth converted.msgpack

Converts a reference torch checkpoint (e.g. the released
`mvtracker_200000_june2025.pth`) into flax msgpack params loadable with
`flax.serialization.from_bytes` / usable directly by this framework's
MVTracker (architecture parity is covered by tests/test_reference_parity.py).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("input", help="torch .pth checkpoint")
    parser.add_argument("output", help="output .msgpack params file")
    args = parser.parse_args(argv)

    import flax.serialization

    from mvtracker_tpu.convert import load_reference_checkpoint

    params = load_reference_checkpoint(args.input)
    blob = flax.serialization.to_bytes(params)
    with open(args.output, "wb") as f:
        f.write(blob)
    n = sum(p.size for p in _leaves(params))
    print(f"converted {n:,} parameters -> {args.output}")


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


def load_converted(path: str, model, example_args, iters: int = 4):
    """Load a converted .msgpack into a params pytree shaped by `model`."""
    import jax
    import flax.serialization

    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), *example_args, iters=iters)
    )
    import numpy as np

    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), template)
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(template, f.read())


if __name__ == "__main__":
    main()
