"""DROID data-factory CLI: ``python -m mvtracker_tpu.cli.droid``.

Replaces the reference's shell orchestrators
(`run_pipeline_cluster_huggingface_*.sh`, `process_episodes.sh`): batch
episode processing with a worker pool, failure logs, and skip-if-exists
idempotency — as a proper CLI instead of 2k lines of bash.

    # Process all episodes under a root:
    python -m mvtracker_tpu.cli.droid process --episodes_root X --out Y -j 8

    # Render tracks from a processed episode onto its videos:
    python -m mvtracker_tpu.cli.droid render --episode_out Y/ep0 \
        --video path/to/rgb_video_or_dir --camera 100 --out overlay.gif
"""

from __future__ import annotations

import argparse
import glob
import json
import logging
import os


def cmd_process(args):
    from mvtracker_tpu.droid.pipeline import process_episodes_batch

    episodes = sorted(
        d
        for d in glob.glob(os.path.join(args.episodes_root, "*"))
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "trajectory.h5"))
    )
    if args.max_episodes:
        episodes = episodes[: args.max_episodes]
    logging.info("processing %d episodes with %d workers", len(episodes), args.jobs)
    results = process_episodes_batch(
        episodes,
        args.out,
        num_workers=args.jobs,
        num_track_points=args.num_track_points,
        max_frames=args.max_frames,
    )
    print(json.dumps(results))


def cmd_render(args):
    import numpy as np

    from mvtracker_tpu.droid.transforms import project_tracks_to_2d
    from mvtracker_tpu.viz.mp4 import render_tracks_on_video, save_video

    tracks = np.load(os.path.join(args.episode_out, "tracks.npz"))
    key = f"tracks_2d_{args.camera}"
    if key in tracks:
        tracks_2d = tracks[key]
    else:
        extr = np.load(os.path.join(args.episode_out, "extrinsics.npz"))
        pose = extr[f"external_{args.camera}"] if f"external_{args.camera}" in extr else extr["wrist"]
        k = np.asarray(json.loads(args.intrinsics)) if args.intrinsics else np.eye(3)
        tracks_2d = project_tracks_to_2d(
            tracks["tracks_3d"], k, pose, args.width, args.height
        )

    if os.path.isdir(args.video):
        import imageio.v3 as iio

        files = sorted(os.listdir(args.video))
        video = np.stack(
            [iio.imread(os.path.join(args.video, f))[..., :3] for f in files]
        )
    else:
        import imageio.v3 as iio

        video = np.asarray(iio.imread(args.video))[..., :3]
    t = min(len(video), len(tracks_2d))
    frames = render_tracks_on_video(
        video[:t], np.nan_to_num(tracks_2d[:t], nan=-1e4)
    )
    out = save_video(frames, args.out)
    logging.info("wrote %s", out)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("process")
    p.add_argument("--episodes_root", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("-j", "--jobs", type=int, default=8)
    p.add_argument("--num_track_points", type=int, default=24)
    p.add_argument("--max_frames", type=int, default=None)
    p.add_argument("--max_episodes", type=int, default=None)
    p.set_defaults(fn=cmd_process)

    r = sub.add_parser("render")
    r.add_argument("--episode_out", required=True)
    r.add_argument("--video", required=True)
    r.add_argument("--camera", default="100")
    r.add_argument("--out", default="overlay.gif")
    r.add_argument("--intrinsics", default=None, help="JSON 3x3 K (if no cached 2D tracks)")
    r.add_argument("--width", type=int, default=320)
    r.add_argument("--height", type=int, default=240)
    r.set_defaults(fn=cmd_render)

    args = parser.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
