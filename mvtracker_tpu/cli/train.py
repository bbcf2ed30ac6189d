"""Training CLI: ``python -m mvtracker_tpu.cli.train [--config X] [k=v ...]``.

Replaces the reference's Hydra entry (`mvtracker/cli/train.py:342`).
Example:

    python -m mvtracker_tpu.cli.train --config configs/overfit.yaml \
        trainer.total_steps=1000 data.dataset=synthetic
"""

from __future__ import annotations

import argparse
import logging


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None, help="YAML config preset")
    parser.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    import os

    import jax

    import mvtracker_tpu

    mvtracker_tpu.enable_compilation_cache()

    # Multi-host: initialize the distributed runtime when launched under a
    # multi-process environment (TPU pod slice / SLURM — the reference's
    # SLURM-derived Fabric setup, `cli/train.py:353-365`).
    if os.environ.get("MVTRACKER_DISTRIBUTED", "0") == "1":
        jax.distributed.initialize()

    from mvtracker_tpu.config import build_dataset, build_model, format_config_tree, load_config
    from mvtracker_tpu.datasets.loader import PrefetchLoader
    from mvtracker_tpu.parallel import mesh as mesh_lib
    from mvtracker_tpu.training.train import Trainer

    cfg = load_config(args.config, args.overrides)
    logging.info("resolved config:\n%s", format_config_tree(cfg))

    model = build_model(cfg.model)
    dataset = build_dataset(cfg.data)
    loader = PrefetchLoader(
        dataset,
        # batch_size is the GLOBAL scene count per step; each process loads
        # its per-host slice and feeds it as its shard of the global batch
        # (`parallel.mesh.shard_batch_pytree`).
        batch_size=max(cfg.data.batch_size // jax.process_count(), 1),
        num_workers=cfg.data.num_workers,
        seed=cfg.data.seed,
        process_index=jax.process_index() if jax.process_count() > 1 else None,
        process_count=jax.process_count() if jax.process_count() > 1 else None,
    )

    mesh = None
    if len(jax.devices()) > 1:
        mesh = mesh_lib.make_mesh(n_data=cfg.mesh_data, n_model=cfg.mesh_model)
        logging.info("mesh: %s", dict(mesh.shape))

    # Periodic eval (reference eval_freq, `cli/train.py:873-875`).
    def eval_fn(state, step):
        from mvtracker_tpu.evaluation.evaluator import Evaluator
        from mvtracker_tpu.evaluation.predictor import EvaluationPredictor

        predictor = EvaluationPredictor(
            model,
            state.params,
            interp_shape=tuple(cfg.eval.interp_shape) if cfg.eval.interp_shape else None,
            grid_size=cfg.eval.grid_size,
            n_iters=cfg.eval.n_iters,
        )
        evaluator = Evaluator(cfg.eval.setting)
        summary, _ = evaluator.evaluate_sequence(
            predictor, dataset, max_sequences=cfg.eval.max_sequences or 2
        )
        logging.info("eval @ step %d: %s", step, summary.get("all_any", {}))
        return summary

    static_iter = None
    if cfg.trainer.static_pretrain_steps > 0 and cfg.data.dataset == "synthetic":
        from mvtracker_tpu.datasets.loader import SyntheticSceneDataset

        static_ds = SyntheticSceneDataset(
            n_scenes=32,
            seed=cfg.data.seed + 1,
            n_views=cfg.data.n_views,
            n_frames=cfg.data.n_frames,
            height=cfg.data.height,
            width=cfg.data.width,
            n_tracks=cfg.data.num_tracks,
            static_fraction=1.0,
        )
        # Same per-host slicing as the main loader: global batch divided
        # across processes, disjoint scene strides per process.
        static_iter = iter(
            PrefetchLoader(
                static_ds,
                batch_size=max(cfg.data.batch_size // jax.process_count(), 1),
                num_workers=cfg.data.num_workers,
                process_index=jax.process_index() if jax.process_count() > 1 else None,
                process_count=jax.process_count() if jax.process_count() > 1 else None,
            )
        )

    trainer = Trainer(model, cfg.trainer, mesh=mesh, shard_views=cfg.shard_views)
    trainer.fit(loader.prefetching_iter(), eval_fn=eval_fn, static_data_iter=static_iter)


if __name__ == "__main__":
    main()
