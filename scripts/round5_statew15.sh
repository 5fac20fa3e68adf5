#!/bin/bash
# Round-5 one-shot: state-region window-15 / 120-epoch non-Bayes rows
# (9 cells: CONN/UONN/SONN x nums 1-3, season 2016) so the w15/e120 slice
# of results_table_synth covers all three regions like the reference's
# committed table does.  Sliced into lock-bounded passes (the state-w15
# shape needs one cold Mosaic compile, then ~250-500 s/cell warm) so the
# v7/v8 chains and the tuning soaker keep their interleave share.
#
# Usage: scripts/round5_statew15.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/statew15.log}

done_rows() {
  python - <<'EOF' 2>/dev/null
import pandas as pd
try:
    r = pd.read_csv("docs/results_table_synth.csv")
    n = len(r[(r["region"] == "state") & (r["window_size"] == 15)
              & (r["epochs"] == 120)])
except Exception:
    n = 0
print(n)
EOF
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  N=$(done_rows)
  echo "[statew15] $(date -u +%H:%M:%S) rows=$N" >> "$LOG"
  [ "${N:-0}" -ge 9 ] && break
  LEFT=$(( DEADLINE - $(date +%s) ))
  BUDGET=2700; [ "$LEFT" -lt "$BUDGET" ] && BUDGET=$LEFT
  [ "$BUDGET" -le 300 ] && break
  timeout "$BUDGET" python scripts/run_sweep.py \
      --synthetic --population --padded --fused-train --chip-lock \
      --skip-done --gammas 28 --out "$PWD/docs/results_table_synth" \
      --work-dir "/tmp/sw_statew15_$(date +%s)" \
      --regions state --models CONN UONN SONN --seasons 2016 \
      --epochs 120 --windows 15 --nums 1 2 3 >> "$LOG" 2>&1
  echo "[statew15] $(date -u +%H:%M:%S) pass rc=$?" >> "$LOG"
  sleep 300
done
echo "[statew15] done $(date -u) rows=$(done_rows)" >> "$LOG"
