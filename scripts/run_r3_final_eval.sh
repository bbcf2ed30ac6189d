#!/bin/bash
# Round-3 end-of-round sequence (run AFTER stopping the training run;
# the single chip serializes TPU processes).
#
#   scripts/run_r3_final_eval.sh [exp_dir]
#
# 1. Held-out eval sweep with calibrated visibility threshold -> RESULTS_r3_flagship.json
# 2. Serving-mode (corr_knn_reuse) quality re-verification     -> RESULTS_r3_flagship_knnreuse.json
# 3. bench.py (headline + serving + flagship-train fields)     -> stdout JSON line
set -euo pipefail
cd "$(dirname "$0")/.."
EXP=${1:-experiments/r3_flagship}

python scripts/eval_checkpoint.py --exp_dir "$EXP" --model_size flagship \
    --vis_geom --vis_head_hidden 128 --views 4 --res 128 --frames 12 \
    --n_tracks 32 --iters 3 --grid 0 5 \
    --out_json RESULTS_r3_flagship.json

python scripts/eval_checkpoint.py --exp_dir "$EXP" --model_size flagship \
    --vis_geom --vis_head_hidden 128 --views 4 --res 128 --frames 12 \
    --n_tracks 32 --iters 3 --grid 5 --knn_reuse \
    --out_json RESULTS_r3_flagship_knnreuse.json

# Round-2 medium checkpoint (known to beat CopyCat on positions at res 64)
# under the SAME round-3 protocol: res-128 domain, exact labels, calibrated
# threshold — the cross-round comparison point.
python scripts/eval_checkpoint.py --exp_dir experiments/r2_medium_tex \
    --model_size medium --views 4 --res 128 --frames 12 \
    --n_tracks 32 --iters 3 --grid 0 5 \
    --out_json RESULTS_r3_r2medium_rescored.json

python bench.py
