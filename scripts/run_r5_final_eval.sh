#!/bin/bash
# Round-5 close-out for the r5_ft continuation (the released stage-2c
# weights continued for 25k res-128 steps at lr 1e-4, NO new knobs).
#
# Staged-export protocol (advisor round-4): the release is only
# overwritten AFTER the gate table is reviewed; this script stages the
# export, evaluates on the graded protocol, and prints the gate tables.
# On-chip jobs serialize — run after training completes.
set -euo pipefail
cd "$(dirname "$0")/.."

EXP=${1:-experiments/r5_ft}
SIZE=${2:-medium}
VISFLAGS=${VISFLAGS:---vis_geom --vis_head_hidden 128}

STAGED=/tmp/mvtracker_medium_synth.r5.msgpack
python scripts/export_params_msgpack.py --exp_dir "$EXP" --model_size "$SIZE" \
    $VISFLAGS --dtype bfloat16 \
    --out "$STAGED"

COMMON="--exp_dir $EXP --model_size $SIZE $VISFLAGS --fp32 \
  --views 4 --res 128 --frames 12 --n_tracks 32 \
  --texture_detail 1.0 --texture_noise 1.0 --iters 3 --grid 0"

# Main result: interp sweep at grid 0 (native 128 won for stage-2c).
python scripts/eval_checkpoint.py $COMMON --interp 128 192 \
    --out_json RESULTS_r5_main.json

# Serving-mode quality re-verification on this checkpoint (per-round rule).
python scripts/eval_checkpoint.py $COMMON --interp 128 --knn_reuse \
    --out_json RESULTS_r5_knnreuse.json

# bf16-msgpack parity (advisor round-4 #3): score the STAGED ARTIFACT
# itself (the file a user downloads), not just the fp32 orbax state it
# was exported from — confirms the cast survives at the headline config.
python scripts/eval_checkpoint.py --exp_dir /tmp/eval_r5_msgpack \
    --params_msgpack "$STAGED" --model_size "$SIZE" $VISFLAGS --fp32 \
    --views 4 --res 128 --frames 12 --n_tracks 32 \
    --texture_detail 1.0 --texture_noise 1.0 --iters 3 --grid 0 \
    --interp 128 --out_json RESULTS_r5_msgpack.json

echo "=== gate tables (vs CopyCat) ==="
for f in RESULTS_r5_main RESULTS_r5_knnreuse RESULTS_r5_msgpack; do
  echo "--- $f"
  python scripts/compare_results.py "$f.json" || true
done

echo "staged export at $STAGED — review gate tables, then:"
echo "  cp $STAGED release/mvtracker_medium_synth.msgpack"
