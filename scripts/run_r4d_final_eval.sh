#!/bin/bash
# Round-4 session-2 close-out for the r4_ft128d continuation fine-tune
# (the released stage-2b weights continued at lr 1e-4 with NO new knobs —
# 16k steps scheduled, stopped at 6.9k by the session deadline via the
# SIGTERM signal-checkpoint path — the "longer fine-tune" lever from the
# stage-2b post-mortem in NOTES.md).
#
# This file records the commands AS ACTUALLY RUN for the committed
# RESULTS_r4d_*.json artifacts (advisor round-4 finding: an earlier
# version requested --interp 192 / --grid 0 5 while the artifacts were
# produced at interp 128 / grid 0).
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

# 1. Export bf16 msgpack to a STAGING path (advisor round-4: don't
#    overwrite the release before the gate table passes; promotion to
#    release/ is the explicit last step).
STAGED=/tmp/mvtracker_medium_synth.staged.msgpack
python scripts/export_params_msgpack.py --exp_dir "$EXP" --model_size "$SIZE" \
    $VISFLAGS --dtype bfloat16 \
    --out "$STAGED"

COMMON="--exp_dir $EXP --model_size $SIZE $VISFLAGS --fp32 \
  --views 4 --res 128 --frames 12 --n_tracks 32 \
  --texture_detail 1.0 --texture_noise 1.0 --iters 3 --grid 0"

# 2. Main result: interp sweep at grid 0 (the grid-5 sweep was dropped
#    from the actually-run close-out to fit the session deadline; native
#    128 won, RESULTS_r4d_main.json key iters3_grid0_interp128).
python scripts/eval_checkpoint.py $COMMON --interp 128 192 \
    --out_json RESULTS_r4d_main.json

# 3. One-knob eval ablations on the same checkpoint (each is
#    eval-toggleable; no retraining involved). All run at native interp
#    128, the main result's best config.
python scripts/eval_checkpoint.py $COMMON --interp 128 --chain_velocity 1.0 \
    --out_json RESULTS_r4d_chainvel.json
python scripts/eval_checkpoint.py $COMMON --interp 128 --global_match \
    --out_json RESULTS_r4d_gmatch.json
python scripts/eval_checkpoint.py $COMMON --interp 128 --knn_reuse \
    --out_json RESULTS_r4d_knnreuse.json

echo "=== gate tables (vs CopyCat) ==="
for f in RESULTS_r4d_main RESULTS_r4d_chainvel RESULTS_r4d_gmatch RESULTS_r4d_knnreuse; do
  echo "--- $f"
  python scripts/compare_results.py "$f.json" || true
done

# 4. Promote to release/ ONLY after reviewing the gate tables above
#    (manual step by design; git revert remains the rollback path):
#      cp "$STAGED" release/mvtracker_medium_synth.msgpack
echo "staged export at $STAGED — review gate tables, then copy to release/"
