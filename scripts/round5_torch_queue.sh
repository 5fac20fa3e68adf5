#!/bin/bash
# Round-5 torch-side head-to-head queue: extend every family to n>=4 seeds
# (VERDICT round-4 item 1).  Pure-CPU torch cells in LOSER-FIRST order — the
# three families torch won at n=2 (US SONN, hhs CONN, hhs SONN) land their
# extra seeds first so the aggregate verdict is meaningful even if the round
# ends early.  Runs niced so interactive/build work preempts it on this
# single-core host; each group is --resume so crashes never repeat cells.
#
# Usage: scripts/round5_torch_queue.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/h2h_torch_r5.log}

run_group() {
  local attempt rc=1
  for attempt in 1 2; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "[torchq] deadline passed; not (re)starting: $*" >> "$LOG"
      return 1
    fi
    echo "[torchq] $(date -u +%H:%M:%S) attempt $attempt: $*" >> "$LOG"
    timeout 21600 nice -n 10 python scripts/head_to_head.py \
        --tree /tmp/h2h --out docs/head_to_head --resume \
        --weights-root /tmp/h2h_runs --platform cpu --sides torch \
        "$@" >> "$LOG" 2>&1
    rc=$?
    echo "[torchq] $(date -u +%H:%M:%S) attempt $attempt rc=$rc: $*" >> "$LOG"
    [ $rc -eq 0 ] && return 0
    sleep 20
  done
  return $rc
}

# losers first (torch leads these at n=2): the extra seeds decide the verdict
run_group --regions US  --models SONN --nums 3 4
run_group --regions hhs --models CONN --nums 3 4
run_group --regions hhs --models SONN --nums 3 4
# the rest of the 8 families
run_group --regions US  --models CONN --nums 3 4 --transfer
run_group --regions US  --models UONN --nums 3 4
run_group --regions hhs --models UONN --nums 3 4
run_group --regions hhs --models CONN --nums 3 4 --transfer
echo "[torchq] all groups attempted; exiting $(date -u)" >> "$LOG"
