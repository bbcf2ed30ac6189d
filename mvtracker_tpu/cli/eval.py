"""Evaluation CLI: ``python -m mvtracker_tpu.cli.eval [--config X] [k=v ...]``.

Replaces the reference's eval entry (`mvtracker/cli/eval.py:7-13`, which is
the train main in eval-only mode). Restores the latest checkpoint from
`trainer.exp_dir` (or runs with random init if none exists) and evaluates
over the configured dataset.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--output", default=None, help="summary JSON path")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s"
    )

    import jax

    import mvtracker_tpu

    mvtracker_tpu.enable_compilation_cache()

    from mvtracker_tpu.config import build_dataset, build_model, load_config
    from mvtracker_tpu.evaluation.evaluator import Evaluator
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.training import step as step_lib
    from mvtracker_tpu.training.train import Trainer

    cfg = load_config(args.config, args.overrides)
    model = build_model(cfg.model)
    dataset = build_dataset(cfg.data)

    # Restore params from the experiment dir if checkpoints exist.
    # Parameterless baselines (CopyCat & co.) have no init/checkpoint.
    import jax.numpy as jnp

    if hasattr(model, "init"):
        example = dataset[0]
        params = jax.jit(lambda k, *a: model.init(k, *a, iters=1))(
            jax.random.PRNGKey(0),
            jnp.asarray(example.video),
            jnp.asarray(example.videodepth),
            jnp.asarray(example.query_points_3d),
            jnp.asarray(example.intrs),
            jnp.asarray(example.extrs),
        )
        trainer = Trainer(model, cfg.trainer)
        optimizer = trainer.optimizer
        state = step_lib.TrainState(
            params, optimizer.init(params), jnp.zeros((), jnp.int32)
        )
        ckpt_dir = os.path.join(cfg.trainer.exp_dir, "checkpoints")
        if os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir):
            state, step = trainer.restore_latest(state)
            logging.info("evaluating checkpoint at step %d", step)
        else:
            logging.warning(
                "no checkpoint found in %s; evaluating random init", ckpt_dir
            )
        params = state.params
    else:
        params = None

    predictor = EvaluationPredictor(
        model,
        params,
        interp_shape=tuple(cfg.eval.interp_shape) if cfg.eval.interp_shape else None,
        visibility_threshold=cfg.eval.visibility_threshold,
        grid_size=cfg.eval.grid_size,
        n_grids_per_view=cfg.eval.n_grids_per_view,
        num_uniformly_sampled_pts=cfg.eval.num_uniformly_sampled_pts,
        n_iters=cfg.eval.n_iters,
    )
    # '-2dpt' dataset names request per-view 2D TAP-Vid metrics alongside
    # the 3D ones (reference eval_2dpt flag, `kubric:124-127`).
    evaluator = Evaluator(
        cfg.eval.setting,
        compute_2d_metrics=bool(getattr(dataset, "mode_2d", False))
        or "-2dpt" in cfg.data.dataset,
        # TAP-Vid strided protocol evaluates bidirectionally.
        query_mode=getattr(dataset, "query_mode", "first"),
    )
    summary, per_seq = evaluator.evaluate_sequence(
        predictor, dataset, max_sequences=cfg.eval.max_sequences
    )
    print(json.dumps(summary, indent=2, default=float))
    if args.output:
        evaluator.save_json(summary, args.output)
        evaluator.save_csv(per_seq, args.output.replace(".json", "_per_seq.csv"))


if __name__ == "__main__":
    main()
