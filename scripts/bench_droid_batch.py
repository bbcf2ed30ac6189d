"""DROID batch-processing throughput (round-3 verdict #8).

Builds N synthetic episodes in the DROID on-disk layout (trajectory.h5
robot states + calibration metadata, the `tests/test_droid.py::make_episode`
format) and times `process_episodes_batch` at several worker counts —
the BASELINE.json config-5 regime (sharded episode batches) measured as
episodes/hour single-host plus the ProcessPool scaling curve. The
reference counterpart is the GNU-parallel multi-GPU shell pool
(`run_pipeline_cluster_huggingface_compressed_lossy.sh:320-336,1003-1033`).

    python scripts/bench_droid_batch.py --episodes 20 --workers 1 2 4
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=20)
    p.add_argument("--frames", type=int, default=120,
                   help="frames per episode (DROID episodes are ~minutes; "
                   "120 @15fps = 8s — scale linearly)")
    p.add_argument("--track_points", type=int, default=32)
    p.add_argument("--workers", type=int, nargs="+", default=[1, 2])
    p.add_argument("--out_json", default=None)
    args = p.parse_args()

    from pathlib import Path

    from mvtracker_tpu.droid import pipeline
    from tests.test_droid import make_episode

    root = Path(tempfile.mkdtemp(prefix="droid_bench_"))
    try:
        eps = []
        t0 = time.perf_counter()
        for i in range(args.episodes):
            d = root / f"gen_{i}"
            d.mkdir()
            ep = Path(make_episode(d, t=args.frames))
            # make_episode always names the dir episode_000; batch out dirs
            # key on the basename, so give each episode a unique name.
            uniq = d / f"episode_{i:03d}"
            ep.rename(uniq)
            eps.append(str(uniq))
        gen_s = time.perf_counter() - t0

        report = {
            "episodes": args.episodes,
            "frames_per_episode": args.frames,
            "gen_s": round(gen_s, 2),
            "host_cpus": os.cpu_count(),
            "runs": [],
        }
        for w in args.workers:
            out = root / f"out_w{w}"
            t0 = time.perf_counter()
            res = pipeline.process_episodes_batch(
                eps, str(out), num_workers=w,
                num_track_points=args.track_points,
            )
            el = time.perf_counter() - t0
            run = {
                "workers": w,
                "wall_s": round(el, 2),
                "episodes_per_hour": round(args.episodes / el * 3600, 1),
                "results": res,
            }
            report["runs"].append(run)
            print(json.dumps(run))
        if len(report["runs"]) >= 2:
            base = report["runs"][0]
            for run in report["runs"][1:]:
                run["scaling_vs_1w"] = round(
                    run["episodes_per_hour"] / base["episodes_per_hour"], 2
                )
        print(json.dumps(report, indent=2))
        if args.out_json:
            with open(args.out_json, "w") as f:
                json.dump(report, f, indent=2)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
