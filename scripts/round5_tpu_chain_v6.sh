#!/bin/bash
# Round-5 chip chain v6 (post-deadline overtime): keep filling the two
# volume artifacts — stage-B result rows and the tuning sweep — in SHORT
# invocations (<=900 s each) so the advisory chip lock is released every
# ~15 min and a driver bench can always acquire it within its own 900 s
# wait.  Alternates sweep/tuning units until the hard deadline.
#
# Usage: scripts/round5_tpu_chain_v6.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_chain_r5f.log}

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
  [ "$left" -le 180 ] && return 1
  probe_tpu || { echo "[chain6] tunnel down before $label" >> "$LOG"; sleep 120; return 1; }
  local budget=$(( left - 120 ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "[chain6] $(date -u +%H:%M:%S) start $label (budget ${budget}s)" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "[chain6] $(date -u +%H:%M:%S) $label rc=$?" >> "$LOG"
}

while [ "$(remaining)" -gt 240 ]; do
  # loser-family recipe ablation first (transient TPU error killed the v5
  # attempt; cells are ~2 min each on the epoch-scan path and --resume
  # skips everything already landed)
  unit 900 ablation python scripts/ablate_h2h.py \
      --tree /tmp/h2h --out docs/h2h_ablation --resume \
      --weights-root /tmp/h2h_ablation_runs --platform ambient \
      --families US:SONN --nums 1 2 \
      --variants base lr5e-4 warmup gradlim1500 anneal25 pre3 \
      --deadline $(( DEADLINE - 120 ))

  # finish the window-7 block (hhs Bayes + state 2016 remainders), then
  # spread to window 22; the work-dir ledgers dedup everything already done
  unit 900 stageB-w7 python scripts/run_sweep.py \
      --synthetic --regions hhs --models CONNb UONNb SONNb \
      --seasons 2015 2016 --epochs 60 --windows 7 --gammas 28 \
      --nums 1 2 3 --population --padded --fused-train --chip-lock \
      --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep

  unit 900 tuning python scripts/tune_worker.py 0 \
      --csv docs/validation_scores_synth.csv --max-rows 400 --chip-lock

  unit 900 stageB-state16 python scripts/run_sweep.py \
      --synthetic --regions state \
      --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 7 --gammas 28 \
      --nums 1 2 3 --population --padded --fused-train --chip-lock \
      --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_state

  unit 900 stageB-w22 python scripts/run_sweep.py \
      --synthetic --regions US hhs \
      --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 22 --gammas 28 \
      --nums 1 2 3 --population --padded --fused-train --chip-lock \
      --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep_wspread
done
echo "[chain6] done; exiting $(date -u)" >> "$LOG"
