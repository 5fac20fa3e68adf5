#!/bin/bash
# Round-5 chip chain, priority-ordered per VERDICT round-4 "next round":
#   0. bench.py once (validates the chip + warms the persistent compile cache)
#   1. fiude head-to-head seeds 3,4 for all 8 families (+ transfer)  [item 1]
#   2. stage-B window-7 completion: all 6 families x US/hhs x 3 seeds [item 2]
#   3. state-region rows (49-region config) for the synth table      [item 2]
#   4. tuning-sweep artifact: claim/score soak at volume             [item 3]
#   5. window-spread rows (1/22/29) with whatever budget remains     [item 2]
#   6. steady-state timing stamps for the new h2h cells
# Every stage is deadline-bounded and serializes through the advisory chip
# lock; sweeps are ledger-resumable so a crash or tunnel outage never
# repeats finished work (round-3/4 lessons).
#
# Usage: scripts/round5_tpu_chain.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_chain_r5.log}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

probe_tpu() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
EOF
}

wait_for_tpu() {
  while [ "$(remaining)" -gt 600 ]; do
    if probe_tpu; then return 0; fi
    echo "[chain] $(date -u +%H:%M:%S) tunnel down; sleeping 300s" >> "$LOG"
    sleep 300
  done
  return 1
}

stage() {  # stage <min-budget-s> <reserve-s> <cap-s> <label> <cmd...>
  local need=$1 reserve=$2 cap=$3 label=$4; shift 4
  local left; left=$(remaining)
  if [ "$left" -le "$need" ]; then
    echo "[chain] skip $label (only ${left}s left)" >> "$LOG"
    return 1
  fi
  wait_for_tpu || return 1
  left=$(remaining)
  local budget=$(( left - reserve ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "[chain] $(date -u +%H:%M:%S) start $label (budget ${budget}s)" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "[chain] $(date -u +%H:%M:%S) $label rc=$rc" >> "$LOG"
  return $rc
}

stage 900 600 3600 bench python bench.py

stage 1800 900 7200 h2h-fiude-seeds python scripts/head_to_head.py \
    --tree /tmp/h2h --out docs/head_to_head --resume \
    --weights-root /tmp/h2h_runs --platform ambient \
    --regions US hhs --nums 3 4 --sides fiude \
    --models CONN UONN SONN --transfer

stage 1800 900 7200 stageB-w7 python scripts/run_sweep.py \
    --synthetic --regions US hhs \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 7 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep

stage 1800 900 9000 stageB-state python scripts/run_sweep.py \
    --synthetic --regions state \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 7 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_state

if [ ! -f docs/validation_scores_synth.csv ]; then
  python scripts/make_tuning_grid.py --out docs/validation_scores_synth.csv \
      --latent-dims 4 6 8 --hidden-sizes 16 32 64 128 \
      --window-sizes 7 14 28 42 --batch-sizes 16 32 \
      --n-samples 32 --epochs 50 >> "$LOG" 2>&1
fi
stage 3600 2400 10800 tuning python scripts/tune_worker.py 0 \
    --csv docs/validation_scores_synth.csv --max-rows 400 --chip-lock

stage 1800 900 14400 stageB-windows python scripts/run_sweep.py \
    --synthetic --regions US hhs \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 1 22 29 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_wspread

stage 900 300 3600 steady-timing python scripts/h2h_steady_timing.py \
    --out "$PWD/docs/head_to_head"

echo "[chain] done; exiting $(date -u)" >> "$LOG"
