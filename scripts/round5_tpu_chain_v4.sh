#!/bin/bash
# Round-5 chip chain v4: rebuilt around the whole-epoch lax.scan trainer
# fast path (c1fc48c), which cut a 120-epoch h2h cell from ~1600-3300 s to
# minutes by removing ~90 tunnel round trips per epoch.  That makes ALL of
# the judge's round-5 data-volume items feasible in the remaining window:
#   1. fiude h2h loser-family cells first (US/hhs SONN + hhs CONN seeds),
#      including the TPU refresh of the round-4 cpu-outage fallback rows
#      (archived to docs/head_to_head_cpu_fallback.csv — see HEAD_TO_HEAD.md)
#   2. the rest of the fiude seed extension + transfer cells to n=4
#   3. loser-family recipe ablation (resume)
#   4. stage-B window-7 completion + state rows (population sweep)
#   5. tuning-sweep artifact soak + rerun-best
#   6. steady-timing stamps, then window-spread rows with whatever remains
#
# Usage: scripts/round5_tpu_chain_v4.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_chain_r5d.log}

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
    echo "[chain4] $(date -u +%H:%M:%S) tunnel down; sleeping 300s" >> "$LOG"
    sleep 300
  done
  return 1
}

stage() {  # stage <min-budget-s> <reserve-s> <cap-s> <label> <cmd...>
  local need=$1 reserve=$2 cap=$3 label=$4; shift 4
  local left; left=$(remaining)
  if [ "$left" -le "$need" ]; then
    echo "[chain4] skip $label (only ${left}s left)" >> "$LOG"
    return 1
  fi
  wait_for_tpu || return 1
  left=$(remaining)
  local budget=$(( left - reserve ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "[chain4] $(date -u +%H:%M:%S) start $label (budget ${budget}s)" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "[chain4] $(date -u +%H:%M:%S) $label rc=$rc" >> "$LOG"
  return $rc
}

# 1. loser families first: refresh the cpu-fallback n=1 rows on TPU and land
#    the n=3,4 seeds (resume skips existing TPU rows)
stage 900 600 5400 h2h-losers python scripts/head_to_head.py \
    --tree /tmp/h2h --out docs/head_to_head --resume \
    --weights-root /tmp/h2h_runs --platform ambient \
    --regions US hhs --nums 1 3 4 --sides fiude \
    --models SONN CONN

# 2. the rest of the fiude grid incl. UONN + CONN->UONN_pre transfer
stage 900 600 7200 h2h-rest python scripts/head_to_head.py \
    --tree /tmp/h2h --out docs/head_to_head --resume \
    --weights-root /tmp/h2h_runs --platform ambient \
    --regions US hhs --nums 1 3 4 --sides fiude \
    --models CONN UONN SONN --transfer

# 3. recipe ablation on the loser families (resume; fast path now)
stage 900 600 5400 ablation python scripts/ablate_h2h.py \
    --tree /tmp/h2h --out docs/h2h_ablation --resume \
    --weights-root /tmp/h2h_ablation_runs --platform ambient \
    --families US:SONN hhs:CONN hhs:SONN --nums 1 2 \
    --variants base lr5e-4 warmup gradlim1500 anneal25 pre3 \
    --deadline $(( DEADLINE - 600 ))

# 4. stage-B window-7 completion (US+hhs), then state rows
stage 900 600 3600 stageB-w7 python scripts/run_sweep.py \
    --synthetic --regions US hhs \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 7 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep

stage 900 600 3600 stageB-state python scripts/run_sweep.py \
    --synthetic --regions state \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 7 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_state

# 5. tuning-sweep artifact: grid + soak + best-config re-runs
if [ ! -f docs/validation_scores_synth.csv ]; then
  python scripts/make_tuning_grid.py --out docs/validation_scores_synth.csv \
      --latent-dims 4 6 8 --hidden-sizes 16 32 64 128 \
      --window-sizes 7 14 28 42 --batch-sizes 16 32 \
      --n-samples 32 --epochs 50 >> "$LOG" 2>&1
fi
stage 900 600 5400 tuning python scripts/tune_worker.py 0 \
    --csv docs/validation_scores_synth.csv --max-rows 400 --chip-lock

stage 600 600 1800 tuning-rerun python scripts/rerun_best_tuning.py \
    --csv docs/validation_scores_synth.csv --run-best 5 --run-each 2 \
    --out docs/tuning_rerun --chip-lock

# 6. steady-timing stamps for new cells, then window-spread rows
stage 600 300 1800 steady-timing python scripts/h2h_steady_timing.py \
    --out "$PWD/docs/head_to_head"

stage 900 300 14400 stageB-windows python scripts/run_sweep.py \
    --synthetic --regions US hhs \
    --models CONN UONN SONN CONNb UONNb SONNb \
    --seasons 2015 2016 --epochs 60 --windows 1 22 29 --gammas 28 \
    --nums 1 2 3 --population --padded --fused-train --chip-lock \
    --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_wspread

echo "[chain4] done; exiting $(date -u)" >> "$LOG"
