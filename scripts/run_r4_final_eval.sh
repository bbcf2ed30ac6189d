#!/bin/bash
# Round-4 close-out: export the trained weights, evaluate on the graded
# protocol (res-128, noise-texture domain, calibrated threshold, 8
# held-out scenes) with the inference-knob ablations, and refresh the
# released artifact. Run AFTER the last training stage completes; on-chip
# jobs execute sequentially (single chip).
set -euo pipefail
cd "$(dirname "$0")/.."

EXP=${1:-experiments/r4_ft128}          # experiment dir with checkpoints
SIZE=${2:-medium}
K0=${3:-24}                              # corr_k0 the stage trained with
VISFLAGS=${VISFLAGS:---vis_geom --vis_head_hidden 128}

# 1. Export bf16 msgpack -> release/ (the round-4 rule: a checkpoint that
#    only lives on disk does not exist).
python scripts/export_params_msgpack.py --exp_dir "$EXP" --model_size "$SIZE" \
    $VISFLAGS --corr_k0 "$K0" --dtype bfloat16 \
    --out release/mvtracker_medium_synth.msgpack

# 2. Graded protocol + ablations. Calibration split seed 555 picks the
#    visibility threshold; held-out split seed 777 reports.
COMMON="--exp_dir $EXP --model_size $SIZE $VISFLAGS --corr_k0 $K0 --fp32 \
  --views 4 --res 128 --frames 12 --n_tracks 32 \
  --texture_detail 1.0 --texture_noise 1.0 --iters 3"

# Full config (global match + velocity chaining).
python scripts/eval_checkpoint.py $COMMON --global_match --chain_velocity 1.0 \
    --grid 0 5 --out_json RESULTS_r4_full.json
# Ablation: no global match.
python scripts/eval_checkpoint.py $COMMON --chain_velocity 1.0 \
    --grid 0 --out_json RESULTS_r4_no_gmatch.json
# Ablation: reference-parity inference (no new inference knobs).
python scripts/eval_checkpoint.py $COMMON \
    --grid 0 --out_json RESULTS_r4_parity_inference.json
# Serving mode re-verification on this checkpoint.
python scripts/eval_checkpoint.py $COMMON --global_match --chain_velocity 1.0 \
    --knn_reuse --grid 0 --out_json RESULTS_r4_knnreuse.json

echo "=== summaries ==="
for f in RESULTS_r4_full RESULTS_r4_no_gmatch RESULTS_r4_parity_inference RESULTS_r4_knnreuse; do
  python - <<EOF
import json
r = json.load(open("$f.json"))
b = r["best"]
key = f"iters{b['iters']}_grid{b['grid']}" + (f"_interp{b['interp']}" if b.get("interp") else "")
h = r[key]["heldout_calibrated"]; c = r["copycat"]
print("$f:", "AJ %.2f/%.2f ATE %.2f/%.2f ptw %.2f/%.2f OA %.2f/%.2f" % (
    h["average_jaccard"], c["average_jaccard"], h["ate_visible"], c["ate_visible"],
    h["average_pts_within_thresh"], c["average_pts_within_thresh"],
    h["occlusion_accuracy"], c["occlusion_accuracy"]))
EOF
done
