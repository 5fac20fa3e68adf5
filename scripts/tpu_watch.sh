#!/bin/bash
# Watch for the axon tunnel to come back; when it does, use the chip in
# priority order and NEVER past the deadline (the round-3 lesson):
#   1. bench.py once — driver-verifiable perf numbers + warms the
#      persistent compile cache the driver's own bench run will hit
#   2. the Bayes-family sweep (CONNb/UONNb/SONNb x US/hhs x 3 seeds at the
#      real 120-epoch budget) through the fused variational kernels
# Everything chip-side serializes through fiude_tpu/utils/chiplock.py via
# bench.py itself and the sweep wrapper below.
#
# Usage: scripts/tpu_watch.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_watch.log}

probe_tpu() {
  timeout 120 python - <<'EOF' >/dev/null 2>&1
import jax
assert jax.devices()[0].platform == "tpu"
EOF
}

remaining() { echo $(( DEADLINE - $(date +%s) )); }

while [ "$(remaining)" -gt 600 ]; do
  if probe_tpu; then
    echo "[watch] $(date -u) TPU UP" >> "$LOG"

    echo "[watch] running bench.py (validation + cache warm)" >> "$LOG"
    timeout 3600 python bench.py >> "$LOG" 2>&1
    echo "[watch] bench rc=$?" >> "$LOG"

    # fast, high-value: warm steady-state columns for the h2h table
    # (minutes once the compile cache is warm; before the long sweep in
    # case the tunnel window is short)
    echo "[watch] running h2h steady timing" >> "$LOG"
    timeout 5400 python scripts/h2h_steady_timing.py \
        --out "$PWD/docs/head_to_head" >> "$LOG" 2>&1
    echo "[watch] steady timing rc=$?" >> "$LOG"

    # remaining h2h cells on the chip (VERDICT #1 outranks the sweep):
    # warm-cache TPU cells are ~minutes each; --resume skips everything the
    # CPU queue already landed, and the chip lock serializes with it
    left=$(remaining)
    if [ "$left" -gt 1800 ]; then
      echo "[watch] sweeping remaining h2h cells on TPU (budget ${left}s)" >> "$LOG"
      timeout $(( left - 900 )) python scripts/head_to_head.py \
          --tree /tmp/h2h --out docs/head_to_head --resume \
          --weights-root /tmp/h2h_runs --platform ambient \
          --regions US hhs --nums 1 2 --sides fiude \
          --models CONN UONN SONN --transfer >> "$LOG" 2>&1
      echo "[watch] h2h-on-tpu rc=$?" >> "$LOG"
    fi

    left=$(remaining)
    if [ "$left" -gt 1200 ]; then
      echo "[watch] launching Bayes sweep (budget ${left}s)" >> "$LOG"
      timeout $(( left - 600 )) python scripts/run_sweep.py \
          --synthetic --regions US hhs \
          --models CONNb UONNb SONNb --seasons 2015 2016 2017 2018 \
          --epochs 120 --windows 15 --gammas 28 --nums 1 2 3 \
          --padded --fused-train --chip-lock \
          --out "$PWD/docs/results_table_synth" --work-dir /tmp/bayes_sweep \
          >> "$LOG" 2>&1
      echo "[watch] sweep rc=$? at $(date -u)" >> "$LOG"
    fi

    # stage B (only with time left): broaden the table toward >=100 rows —
    # all six families x US/hhs x two windows x 3 seeds at a 60-epoch
    # budget, 2 seasons each; ledger-resumable, deadline-bounded
    left=$(remaining)
    if [ "$left" -gt 1800 ]; then
      echo "[watch] launching stage-B grid sweep (budget ${left}s)" >> "$LOG"
      timeout $(( left - 600 )) python scripts/run_sweep.py \
          --synthetic --regions US hhs \
          --models CONN UONN SONN CONNb UONNb SONNb \
          --seasons 2015 2016 --epochs 60 --windows 7 15 --gammas 28 \
          --nums 1 2 3 --padded --fused-train --chip-lock \
          --out "$PWD/docs/results_table_synth" --work-dir /tmp/grid_sweep \
          >> "$LOG" 2>&1
      echo "[watch] stage-B rc=$? at $(date -u)" >> "$LOG"
    fi
    echo "[watch] done; exiting" >> "$LOG"
    exit 0
  fi
  echo "[watch] $(date -u +%H:%M:%S) tunnel still down; sleeping 300s" >> "$LOG"
  sleep 300
done
echo "[watch] deadline reached without tunnel; exiting" >> "$LOG"
