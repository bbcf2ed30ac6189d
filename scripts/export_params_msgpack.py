"""Export a trained experiment's latest orbax checkpoint params to msgpack
(for cross-architecture warm starts via Trainer.warm_start's non-strict
merge: e.g. round-2 medium weights into a vis_geom-extended round-3 model).

    python scripts/export_params_msgpack.py --exp_dir experiments/r2_medium_tex \
        --model_size medium --out /tmp/r2_medium.msgpack
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp_dir", required=True)
    p.add_argument("--model_size", choices=["small", "medium", "flagship"],
                   default="medium")
    p.add_argument("--out", required=True)
    p.add_argument("--res", type=int, default=64)
    p.add_argument("--vis_geom", action="store_true",
                   help="checkpoint was trained with vis_geom_features")
    p.add_argument("--vis_head_hidden", type=int, default=0,
                   help="checkpoint's vis-head hidden width (0 = linear head)")
    p.add_argument("--corr_k0", type=int, default=0,
                   help="finest-level neighbor count the checkpoint was "
                   "trained with (0 = uniform preset k)")
    p.add_argument("--dtype", choices=["float32", "bfloat16", "float16"],
                   default="float32",
                   help="cast exported params (bfloat16 halves artifact size; "
                        "warm_start casts back to the train dtype on load)")
    args = p.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    import flax.serialization

    from mvtracker_tpu.datasets.datapoint import collate
    from mvtracker_tpu.datasets.loader import SyntheticSceneDataset
    from mvtracker_tpu.presets import build_model
    from mvtracker_tpu.training import step as step_lib
    from mvtracker_tpu.training.train import TrainConfig, Trainer

    model = build_model(args.model_size, vis_geom=args.vis_geom,
                        vis_head_hidden=args.vis_head_hidden,
                        corr_k0=args.corr_k0)
    ds = SyntheticSceneDataset(n_scenes=1, cache=True, seed=0, n_views=2,
                               n_frames=8, height=args.res, width=args.res,
                               n_tracks=8)
    batch = collate([ds[0]])
    example = {k: v[0] for k, v in batch.items() if hasattr(v, "ndim") and v.ndim > 0}
    trainer = Trainer(model, TrainConfig(exp_dir=args.exp_dir, tensorboard=False,
                                         watchdog_timeout_s=0))
    state = step_lib.init_state(model, trainer.optimizer, example,
                                jax.random.PRNGKey(0), iters=1)
    state, step = trainer.restore_latest(state)
    assert step > 0, f"no checkpoint in {args.exp_dir}"
    import numpy as np

    import jax.numpy as jnp

    dtype = {"float32": np.float32, "bfloat16": jnp.bfloat16,
             "float16": np.float16}[args.dtype]

    def _cast(x):
        x = np.asarray(x)
        return x.astype(dtype) if np.issubdtype(x.dtype, np.floating) else x

    params = jax.tree.map(_cast, state.params)
    with open(args.out, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(params))
    print(f"exported step-{step} params ({args.dtype}) -> {args.out}")


if __name__ == "__main__":
    main()
