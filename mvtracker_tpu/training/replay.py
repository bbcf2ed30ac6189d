"""Crash-batch replay (L7 forensics).

The trainer dumps the offending batch on any training exception
(`training/train.py`, mirroring reference `cli/train.py:741-766`); this
module reloads those dumps and re-runs the forward/loss for debugging —
the reference's replay hook (`evaluator_3dpt.py:230-245`).

    python -m mvtracker_tpu.training.replay /path/exp/crash/batch_step123.npz
"""

from __future__ import annotations

import argparse
import glob
import logging
import os


def load_crash_batch(path_or_dir: str) -> dict:
    """Load a dumped batch npz (or the latest one in a crash dir)."""
    import numpy as np

    if os.path.isdir(path_or_dir):
        # Numeric sort: lexicographic order would pick step 999 over 1500.
        candidates = sorted(
            glob.glob(os.path.join(path_or_dir, "batch_step*.npz")),
            key=lambda p: int(os.path.basename(p)[len("batch_step"):-len(".npz")]),
        )
        if not candidates:
            raise FileNotFoundError(f"no crash dumps in {path_or_dir}")
        path_or_dir = candidates[-1]
    data = np.load(path_or_dir)
    return {k: data[k] for k in data.files}


def replay(batch: dict, model, params, iters: int = 1) -> dict:
    """Re-run the loss on a crash batch; returns metrics incl. finiteness."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mvtracker_tpu.training import step as step_lib

    def bl(p):
        totals, parts = jax.vmap(
            lambda sc: step_lib.scene_loss(model, p, sc, iters, 0.8, 0.1)
        )(batch)
        return jnp.mean(totals)

    loss, grads = jax.jit(jax.value_and_grad(bl))(params)
    bad = [
        jax.tree_util.keystr(pth)
        for pth, leaf in jax.tree_util.tree_leaves_with_path(grads)
        if not np.isfinite(np.asarray(leaf)).all()
    ]
    return {"loss": float(loss), "nonfinite_grad_leaves": bad}


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="crash npz or crash dir")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    batch = load_crash_batch(args.path)
    print({k: tuple(v.shape) for k, v in batch.items()})


if __name__ == "__main__":
    main()
