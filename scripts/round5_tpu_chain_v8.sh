#!/bin/bash
# Round-5 chip chain v8.  v7 lesson: every unit dies at its timeout budget,
# and completed population groups land incrementally — but a NEW WINDOW
# SHAPE (w22/w1) spends ~25 min in cold Mosaic compiles, so a 1200-1500 s
# slice can die before its first group ever lands.  v8 therefore:
#   * runs the cheap cached-shape season-fill units FIRST (w7 2017/2018 at
#     US+hhs+state — each cell ~100-250 s warm), maximizing rows/hour, and
#   * gives the new-window units compile-sized budgets (2400-3000 s).
# All sweep units dedup via --skip-done against the results CSV itself and
# use a fresh work dir per invocation; the advisory chip lock serializes
# against h2h fiude cells and any driver bench.
#
# Usage: scripts/round5_tpu_chain_v8.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_chain_r5v8.log}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

probe_tpu() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
EOF
}

unit() {  # unit <cap-s> <label> <cmd...>
  local cap=$1 label=$2; shift 2
  local left; left=$(remaining)
  [ "$left" -le 240 ] && return 1
  probe_tpu || { echo "[chain8] tunnel down before $label" >> "$LOG"; sleep 120; return 1; }
  local budget=$(( left - 150 ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "[chain8] $(date -u +%H:%M:%S) start $label (budget ${budget}s)" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "[chain8] $(date -u +%H:%M:%S) $label rc=$?" >> "$LOG"
}

sweep() {  # sweep <cap-s> <label> <extra run_sweep args...>
  local cap=$1 label=$2; shift 2
  unit "$cap" "$label" python scripts/run_sweep.py \
      --synthetic --population --padded --fused-train --chip-lock \
      --skip-done --gammas 28 --out "$PWD/docs/results_table_synth" \
      --work-dir "/tmp/sw_${label}_$(date +%s)" "$@"
}

PASS=0
while [ "$(remaining)" -gt 300 ]; do
  PASS=$(( PASS + 1 ))
  echo "[chain8] ===== pass $PASS ($(remaining))s left =====" >> "$LOG"

  # --- cheap cached-shape units first (warm w7 kernels, ~100-250 s/cell) ---
  # 1. season fill 2017/2018 on the US+hhs window-7 60-epoch grid (36 cells)
  sweep 2400 w7-1718 --regions US hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2017 2018 --epochs 60 --windows 7 --nums 1 2 3
  # 2. leftovers of the 2015/2016 US+hhs w7 block
  sweep 1500 w7-1516 --regions US hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2015 2016 --epochs 60 --windows 7 --nums 1 2 3
  # 3. state 2016 leftovers, then 2017/2018 (family ordering at state scale)
  sweep 2400 state16 --regions state --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 7 --nums 1 2 3
  sweep 2400 state1718 --regions state --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2017 2018 --epochs 60 --windows 7 --nums 1 2 3

  # --- new-window units: compile-sized budgets so the first group can land ---
  # 4. window-22 spread, US+hhs 2016
  sweep 3000 w22 --regions US hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 22 --nums 1 2 3
  # 5. window-1 spread, US 2016
  sweep 2400 w1 --regions US --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 1 --nums 1 2 3
  # 6. window-22 season spread 2015
  sweep 2400 w22-15 --regions US hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2015 --epochs 60 --windows 22 --nums 1 2 3

  # 7. one on-chip tuning unit per pass (claims dedup with any CPU worker
  #    via the CSV lock)
  unit 900 tuning python scripts/tune_worker.py 0 \
      --csv docs/validation_scores_synth.csv --max-rows 12 --chip-lock
done
echo "[chain8] done; exiting $(date -u)" >> "$LOG"
