#!/bin/bash
# Round-5 torch follow-on: n=5,6 seeds for the two US families still
# contested at the n=4 median (US SONN, US UONN).  Waits for the main torch
# queue to drain first, then runs pure-CPU torch cells niced.
#
# Usage: scripts/round5_torch_seeds56.sh <deadline-epoch-seconds> [log] [wait-pid]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/h2h_torch_r5b.log}
WAITPID=${3:-}

if [ -n "$WAITPID" ]; then
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 60; done
fi

run_group() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[torchq2] deadline passed; not starting: $*" >> "$LOG"
    return 1
  fi
  echo "[torchq2] $(date -u +%H:%M:%S) start: $*" >> "$LOG"
  timeout $(( DEADLINE - $(date +%s) )) nice -n 10 python scripts/head_to_head.py \
      --tree /tmp/h2h --out docs/head_to_head --resume \
      --weights-root /tmp/h2h_runs --platform cpu --sides torch \
      "$@" >> "$LOG" 2>&1
  echo "[torchq2] $(date -u +%H:%M:%S) rc=$?: $*" >> "$LOG"
}

run_group --regions US --models SONN --nums 5 6
run_group --regions US --models UONN --nums 5 6
echo "[torchq2] done $(date -u)" >> "$LOG"
