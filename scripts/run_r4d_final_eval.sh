#!/bin/bash
# Round-4 session-2 close-out for the r4_ft128d continuation fine-tune
# (the released stage-2b weights continued for 16k more res-128 steps at
# lr 1e-4, NO new knobs — the "longer fine-tune" lever from the stage-2b
# post-mortem in NOTES.md).
#
# Exports the weights, evaluates on the graded protocol (res-128
# noise-texture domain, calibrated threshold, 8 held-out scenes) with the
# interp sweep that won for stage-2b, then ablates the eval-toggleable
# inference knobs ONE at a time (the stage-2 lesson: knob piles are not
# debuggable). Run AFTER training completes; on-chip jobs serialize.
set -euo pipefail
cd "$(dirname "$0")/.."

EXP=${1:-experiments/r4_ft128d}
SIZE=${2:-medium}
VISFLAGS=${VISFLAGS:---vis_geom --vis_head_hidden 128}

# 1. Export bf16 msgpack -> release/ FIRST (round-4 rule: a checkpoint
#    that only lives on disk does not exist).
python scripts/export_params_msgpack.py --exp_dir "$EXP" --model_size "$SIZE" \
    $VISFLAGS --dtype bfloat16 \
    --out release/mvtracker_medium_synth.msgpack

COMMON="--exp_dir $EXP --model_size $SIZE $VISFLAGS --fp32 \
  --views 4 --res 128 --frames 12 --n_tracks 32 \
  --texture_detail 1.0 --texture_noise 1.0 --iters 3"

# 2. Main result: parity inference, interp x support-grid sweep (192/grid-0
#    won for stage-2b; grid 5 was worth +1.3 AJ on the r2 lineage).
python scripts/eval_checkpoint.py $COMMON --grid 0 5 --interp 128 192 \
    --out_json RESULTS_r4d_main.json

COMMON="$COMMON --grid 0"

# 3. One-knob eval ablations on the same checkpoint (each is
#    eval-toggleable; no retraining involved).
python scripts/eval_checkpoint.py $COMMON --interp 192 --chain_velocity 1.0 \
    --out_json RESULTS_r4d_chainvel.json
python scripts/eval_checkpoint.py $COMMON --interp 192 --global_match \
    --out_json RESULTS_r4d_gmatch.json
python scripts/eval_checkpoint.py $COMMON --interp 192 --knn_reuse \
    --out_json RESULTS_r4d_knnreuse.json

echo "=== gate tables (vs CopyCat) ==="
for f in RESULTS_r4d_main RESULTS_r4d_chainvel RESULTS_r4d_gmatch RESULTS_r4d_knnreuse; do
  echo "--- $f"
  python scripts/compare_results.py "$f.json" || true
done
