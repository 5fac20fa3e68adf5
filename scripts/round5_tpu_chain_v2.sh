#!/bin/bash
# Round-5 chip chain v2 (replaces round5_tpu_chain.sh mid-round): the fiude
# head-to-head seed extension gets the budget it actually needs (~15-30 min
# of cold compile per family x 2 regions), and the stages that follow are
# re-capped so the deadline guard sheds the LOWEST-priority work first:
#   1. fiude h2h seeds 3,4 (VERDICT item 1)               cap 4.0h
#   2. stage-B window-7 completion (item 2)               cap 2.0h
#   3. state-region rows (item 2)                         cap 2.0h
#   4. tuning-sweep artifact soak (item 3)                cap 2.0h
#   5. loser-family recipe ablation (item 1, second half) cap 1.5h
#   6. window-spread rows (item 2, lowest)                cap whatever's left
#   7. h2h steady timing stamps for the new cells
# bench.py already ran this round (rc=0, 26.1M solves/s in the v1 log).
#
# Usage: scripts/round5_tpu_chain_v2.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_chain_r5b.log}

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
    echo "[chain2] $(date -u +%H:%M:%S) tunnel down; sleeping 300s" >> "$LOG"
    sleep 300
  done
  return 1
}

stage() {  # stage <min-budget-s> <reserve-s> <cap-s> <label> <cmd...>
  local need=$1 reserve=$2 cap=$3 label=$4; shift 4
  local left; left=$(remaining)
  if [ "$left" -le "$need" ]; then
    echo "[chain2] skip $label (only ${left}s left)" >> "$LOG"
    return 1
  fi
  wait_for_tpu || return 1
  left=$(remaining)
  local budget=$(( left - reserve ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "[chain2] $(date -u +%H:%M:%S) start $label (budget ${budget}s)" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "[chain2] $(date -u +%H:%M:%S) $label rc=$rc" >> "$LOG"
  return $rc
}

stage 1800 900 14400 h2h-fiude-seeds python scripts/head_to_head.py \
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

stage 1800 900 7200 stageB-state python scripts/run_sweep.py \
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
stage 2400 1200 7200 tuning python scripts/tune_worker.py 0 \
    --csv docs/validation_scores_synth.csv --max-rows 400 --chip-lock

stage 1800 900 5400 ablation python scripts/ablate_h2h.py \
    --tree /tmp/h2h --out docs/h2h_ablation --resume \
    --weights-root /tmp/h2h_ablation_runs --platform ambient \
    --families US:SONN hhs:CONN hhs:SONN --nums 1 2 \
    --variants base lr5e-4 warmup gradlim1500 anneal25 pre3 \
    --deadline $(( DEADLINE - 900 ))

stage 1800 900 14400 stageB-windows python scripts/run_sweep.py \
    --synthetic --regions US hhs \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 1 22 29 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_wspread

stage 900 300 3600 steady-timing python scripts/h2h_steady_timing.py \
    --out "$PWD/docs/head_to_head"

echo "[chain2] done; exiting $(date -u)" >> "$LOG"
