"""Demo CLI (L10): track query points through a multi-view RGB-D clip.

Re-design of the reference `demo.py` (1127 lines): loads an NPZ sample
(same keys as the reference's demo samples: rgbs [V,T,3,H,W] or
[V,T,H,W,3], depths, intrs, extrs, query_points [N,4]), optionally chunks
views/frames for memory, runs the tracker, writes tracks/visibility NPZ
and an mp4 overlay.

    python demo.py --sample sample.npz --out out.npz --mp4 out.mp4
    python demo.py --synthetic  # run on a procedurally generated scene

Reference parity notes:
- NPZ export keys match the reference's (`demo.py:1087-1120`):
  traj_e [T,N,3], vis_e [T,N], query_points [N,4].
- The reference chunks inference over view/frame batches
  (`demo.py:694-880`); here `--chunk_frames` runs fixed-size temporal
  segments through one reused compiled graph with boundary-frame chaining
  (`EvaluationPredictor._forward_chunked`), and `--max_frames` truncates.
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np


def load_sample(path: str):
    data = np.load(path, allow_pickle=True)
    rgbs = np.asarray(data["rgbs"], np.float32)
    depths = np.asarray(data["depths"], np.float32)
    if rgbs.ndim == 5 and rgbs.shape[2] == 3:  # [V,T,3,H,W] -> channels-last
        rgbs = rgbs.transpose(0, 1, 3, 4, 2)
    if depths.ndim == 5:
        depths = depths[:, :, 0] if depths.shape[2] == 1 else depths.squeeze(2)
    intrs = np.asarray(data["intrs"], np.float32)
    extrs = np.asarray(data["extrs"], np.float32)
    if intrs.ndim == 3:  # [V,3,3] -> broadcast over T
        intrs = np.repeat(intrs[:, None], rgbs.shape[1], axis=1)
    if extrs.ndim == 3:
        extrs = np.repeat(extrs[:, None], rgbs.shape[1], axis=1)
    query = np.asarray(data["query_points"], np.float32)
    if rgbs.max() <= 1.0 + 1e-6:
        rgbs = rgbs * 255.0
    return rgbs, depths, query, intrs, extrs


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--sample", default=None, help="input NPZ")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--out", default="demo_out.npz")
    parser.add_argument("--mp4", default=None)
    parser.add_argument("--ckpt_dir", default=None, help="experiment dir with checkpoints")
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument(
        "--chunk_frames", type=int, default=None,
        help="track long videos in fixed segments of this many frames with "
        "boundary-position chaining (one reused compiled graph; bounds HBM "
        "like the reference's --batch_size_frames chunking, demo.py:694-880)",
    )
    parser.add_argument("--grid_size", type=int, default=0, help="support grid size")
    parser.add_argument(
        "--depth_source", default="gt", choices=["gt", "est", "fusion"],
        help="gt: sensor depth; est: first --depth_est replaces it; fusion: "
        "residual-weighted blend of sensor + all estimates (reference "
        "`--depth_estimator`/`_estimate_fused_depths`, demo.py:56-122,310-410)",
    )
    parser.add_argument(
        "--depth_est", nargs="*", default=[],
        help="NPZ files with estimated depth (key 'depth' [V,T,H,W], optional "
        "'conf') from any external estimator (DUSt3R/VGGT/...)",
    )
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax
    import jax.numpy as jnp

    import mvtracker_tpu

    mvtracker_tpu.enable_compilation_cache()
    from mvtracker_tpu.evaluation.predictor import EvaluationPredictor
    from mvtracker_tpu.models.mvtracker import MVTracker

    if args.synthetic or args.sample is None:
        from mvtracker_tpu.datasets.synthetic import render_scene

        sc = render_scene(seed=0, n_views=2, n_frames=12, height=128, width=128, n_tracks=64)
        rgbs, depths = sc.video, sc.videodepth
        query, intrs, extrs = sc.query_points_3d, sc.intrs, sc.extrs
    else:
        rgbs, depths, query, intrs, extrs = load_sample(args.sample)

    if args.max_frames:
        rgbs, depths = rgbs[:, : args.max_frames], depths[:, : args.max_frames]
        intrs, extrs = intrs[:, : args.max_frames], extrs[:, : args.max_frames]
        # Queries starting beyond the truncated clip have no frame where
        # their stored xyz is valid — drop them rather than track phantoms.
        keep = query[:, 0] < rgbs.shape[1]
        if not keep.all():
            logging.warning(
                "dropping %d queries starting beyond --max_frames", (~keep).sum()
            )
            query = query[keep]

    if args.depth_source != "gt":
        estimates = []
        for path in args.depth_est:
            with np.load(path) as z:
                d = np.asarray(z["depth"], np.float32)[:, : rgbs.shape[1]]
                c = np.asarray(z["conf"], np.float32)[:, : rgbs.shape[1]] if "conf" in z else None
            estimates.append((d, c))
        if not estimates:
            parser.error(f"--depth_source {args.depth_source} needs --depth_est files")
        if args.depth_source == "est":
            depths = estimates[0][0]
            logging.info("replaced sensor depth with %s", args.depth_est[0])
        else:
            from mvtracker_tpu.utils.depth_fusion import fuse_depths

            depths, fused_conf = fuse_depths(depths, estimates, rgbs)
            logging.info(
                "fused sensor depth with %d estimate(s); mean conf %.2f",
                len(estimates), float(fused_conf.mean()),
            )

    model = MVTracker()
    params = None
    if args.ckpt_dir:
        import orbax.checkpoint as ocp
        import os

        mgr = ocp.CheckpointManager(os.path.abspath(os.path.join(args.ckpt_dir, "checkpoints")))
        latest = mgr.latest_step()
        if latest is not None:
            restored = mgr.restore(latest)
            params = restored["params"]
            logging.info("loaded checkpoint step %d", latest)
    if params is None:
        logging.warning("no checkpoint: using random init (demo plumbing only)")
        # Params are shape-independent: init on a short slice so a long
        # video doesn't compile/allocate a whole-video graph just for init.
        ti = min(rgbs.shape[1], 8)
        q_init = query.copy()
        q_init[:, 0] = np.minimum(q_init[:, 0], ti - 1)
        params = jax.jit(lambda k, *a: model.init(k, *a, iters=1))(
            jax.random.PRNGKey(0),
            jnp.asarray(rgbs[:, :ti]), jnp.asarray(depths[:, :ti]),
            jnp.asarray(q_init),
            jnp.asarray(intrs[:, :ti]), jnp.asarray(extrs[:, :ti]),
        )

    predictor = EvaluationPredictor(
        model, params, interp_shape=None, grid_size=args.grid_size, n_iters=args.iters,
        chunk_frames=args.chunk_frames,
    )
    t0 = time.perf_counter()
    out = predictor(
        jnp.asarray(rgbs), jnp.asarray(depths), jnp.asarray(query),
        jnp.asarray(intrs), jnp.asarray(extrs),
    )
    traj = np.asarray(out["traj"])
    vis = np.asarray(out["vis"])
    dt = time.perf_counter() - t0
    logging.info(
        "tracked %d points over %d frames in %.2fs (%.0f point-frames/s)",
        query.shape[0], rgbs.shape[1], dt, query.shape[0] * rgbs.shape[1] / dt,
    )

    np.savez(args.out, traj_e=traj, vis_e=vis, query_points=query)
    logging.info("wrote %s", args.out)

    if args.mp4:
        from mvtracker_tpu.viz.mp4 import render_multiview_mosaic, save_video

        frames = render_multiview_mosaic(
            rgbs.astype(np.uint8), traj, intrs, extrs, visibility=vis > 0.5
        )
        written = save_video(frames, args.mp4)
        logging.info("wrote %s", written)


if __name__ == "__main__":
    main()
