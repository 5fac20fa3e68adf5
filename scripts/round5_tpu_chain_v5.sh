#!/bin/bash
# Round-5 chip chain v5: rebalance after the n=4 seed extension landed.
# hhs CONN and hhs SONN are now tied/won at the n=4 family median; the two
# contested families are US SONN (torch by ~0.3) and US UONN (torch's n=3
# seed was an outlier).  With ~2h of chip left, priority order is:
#   1. n=5,6 seeds on the two contested US families (fiude side; ~100 s/cell
#      on the epoch-scan fast path) — sharpen the noisy medians
#   2. stage-B window-7 completion (US+hhs) then state rows  (results volume)
#   3. tuning-sweep artifact soak + rerun-best               (judge item 3)
#   4. trimmed recipe ablation on US SONN                    (mechanics story)
#   5. steady-timing stamps, then window-spread rows with any remainder
#
# Usage: scripts/round5_tpu_chain_v5.sh <deadline-epoch-seconds> [log] [wait-pid]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_chain_r5e.log}
WAITPID=${3:-}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

# let the v4 chain's in-flight stage drain before touching the chip
if [ -n "$WAITPID" ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do
    echo "[chain5] $(date -u +%H:%M:%S) waiting on pid $WAITPID" >> "$LOG"
    sleep 30
  done
fi

probe_tpu() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
EOF
}

wait_for_tpu() {
  while [ "$(remaining)" -gt 600 ]; do
    if probe_tpu; then return 0; fi
    echo "[chain5] $(date -u +%H:%M:%S) tunnel down; sleeping 300s" >> "$LOG"
    sleep 300
  done
  return 1
}

stage() {  # stage <min-budget-s> <reserve-s> <cap-s> <label> <cmd...>
  local need=$1 reserve=$2 cap=$3 label=$4; shift 4
  local left; left=$(remaining)
  if [ "$left" -le "$need" ]; then
    echo "[chain5] skip $label (only ${left}s left)" >> "$LOG"
    return 1
  fi
  wait_for_tpu || return 1
  left=$(remaining)
  local budget=$(( left - reserve ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "[chain5] $(date -u +%H:%M:%S) start $label (budget ${budget}s)" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "[chain5] $(date -u +%H:%M:%S) $label rc=$rc" >> "$LOG"
  return $rc
}

# 1. extra seeds on the contested US families (fiude side, from-scratch cells)
stage 600 400 1200 seeds56 python scripts/head_to_head.py \
    --tree /tmp/h2h --out docs/head_to_head --resume \
    --weights-root /tmp/h2h_runs --platform ambient \
    --regions US --nums 5 6 --sides fiude --models SONN UONN

# 2. stage-B window-7 completion (US+hhs), then state rows
stage 600 400 2400 stageB-w7 python scripts/run_sweep.py \
    --synthetic --regions US hhs \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 7 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep

stage 600 400 1800 stageB-state python scripts/run_sweep.py \
    --synthetic --regions state \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 7 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_state

# 3. tuning-sweep artifact: grid + soak + best-config re-runs
if [ ! -f docs/validation_scores_synth.csv ]; then
  python scripts/make_tuning_grid.py --out docs/validation_scores_synth.csv \
      --latent-dims 4 6 8 --hidden-sizes 16 32 64 128 \
      --window-sizes 7 14 28 42 --batch-sizes 16 32 \
      --n-samples 32 --epochs 50 >> "$LOG" 2>&1
fi
stage 600 400 1800 tuning python scripts/tune_worker.py 0 \
    --csv docs/validation_scores_synth.csv --max-rows 400 --chip-lock

stage 400 400 600 tuning-rerun python scripts/rerun_best_tuning.py \
    --csv docs/validation_scores_synth.csv --run-best 5 --run-each 2 \
    --out docs/tuning_rerun --chip-lock

# 4. trimmed recipe ablation: the one family torch still leads
stage 600 400 1200 ablation python scripts/ablate_h2h.py \
    --tree /tmp/h2h --out docs/h2h_ablation --resume \
    --weights-root /tmp/h2h_ablation_runs --platform ambient \
    --families US:SONN --nums 1 2 \
    --variants base lr5e-4 warmup gradlim1500 anneal25 pre3 \
    --deadline $(( DEADLINE - 400 ))

# 5. steady-timing stamps for new cells, then window-spread rows
stage 400 300 600 steady-timing python scripts/h2h_steady_timing.py \
    --out "$PWD/docs/head_to_head"

stage 600 300 14400 stageB-windows python scripts/run_sweep.py \
    --synthetic --regions US hhs \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 22 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_wspread

echo "[chain5] done; exiting $(date -u)" >> "$LOG"
