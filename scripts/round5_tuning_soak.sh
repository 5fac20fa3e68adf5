#!/bin/bash
# Round-5 on-chip tuning-grid soaker.  The chip chain only reaches its
# tuning filler once per multi-hour pass; this loop claims the chip in
# SHORT bounded units (8 rows ~ 6 min under the advisory lock) and sleeps
# between them, so the stage-B sweep keeps ~2/3 of the chip while the
# tuning artifact still fills at ~25-30 rows/hour.  Rows dedup across all
# workers via the file-locked claim protocol in the CSV itself.
#
# Usage: scripts/round5_tuning_soak.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tuning_soak.log}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  left=$(( DEADLINE - $(date +%s) ))
  [ "$left" -le 300 ] && break
  budget=$(( left - 120 )); [ "$budget" -gt 900 ] && budget=900
  echo "[soak] $(date -u +%H:%M:%S) unit start (budget ${budget}s)" >> "$LOG"
  timeout "$budget" python scripts/tune_worker.py 2 \
      --csv docs/validation_scores_synth.csv --max-rows 8 --chip-lock \
      >> "$LOG" 2>&1
  echo "[soak] $(date -u +%H:%M:%S) unit rc=$?" >> "$LOG"
  sleep 600
done
echo "[soak] done $(date -u)" >> "$LOG"
