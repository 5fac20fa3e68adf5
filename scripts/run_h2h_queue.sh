#!/bin/bash
# Round-4 head-to-head queue: run the missing fiude (and torch hhs num=2)
# cells in priority order, resumable and outage-immune.
#
# Per cell-group: probe the axon tunnel in a throwaway subprocess (a downed
# tunnel HANGS jax.devices(), so the probe needs its own timeout); prefer
# the TPU when it answers, otherwise run the recipe-identical CPU platform
# (accuracy is platform-independent; scripts/head_to_head.py --platform).
# Each invocation is --resume, so a crash or platform switch never repeats
# a finished cell.  A hard deadline stops NEW work well before the round
# cut (the round-3 lesson: background chip jobs must never straddle it).
#
# Usage: scripts/run_h2h_queue.sh <deadline-epoch-seconds> [log-file]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/h2h_r4.log}

probe_tpu() {
  # TPU is usable only if the tunnel answers AND no other chip job (sweep,
  # bench) holds the lock — otherwise run this group on CPU instead of
  # queueing behind a multi-hour holder
  timeout 90 python - <<'EOF' >/dev/null 2>&1
from filelock import FileLock, Timeout
try:
    lock = FileLock("/tmp/fiude_tpu_chip.lock")
    lock.acquire(timeout=1)
except Timeout:
    raise SystemExit(1)
try:
    import jax
    assert jax.devices()[0].platform == "tpu"
finally:
    lock.release()
EOF
}

run_group() {
  # $@: head_to_head.py args for one cell group; up to 3 resumed attempts
  # (a crash mid-group never repeats finished cells)
  local attempt rc=1
  for attempt in 1 2 3; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "[queue] deadline passed; not (re)starting: $*" >> "$LOG"
      return 1
    fi
    local platform=cpu
    if probe_tpu; then platform=ambient; fi
    echo "[queue] $(date -u +%H:%M:%S) attempt $attempt ($platform): $*" >> "$LOG"
    timeout 21600 python scripts/head_to_head.py --tree /tmp/h2h \
        --out docs/head_to_head --resume --weights-root /tmp/h2h_runs \
        --platform "$platform" "$@" >> "$LOG" 2>&1
    rc=$?
    echo "[queue] $(date -u +%H:%M:%S) attempt $attempt rc=$rc: $*" >> "$LOG"
    [ $rc -eq 0 ] && return 0
    sleep 30
  done
  return $rc
}

# Priority 1: fiude US num=1 — the adversarial bar (torch UONN 0.08 NLL)
run_group --regions US --nums 1 --sides fiude --models CONN UONN SONN --transfer
# Priority 2: fiude hhs num=1 — the hhs quality-gap cells
run_group --regions hhs --nums 1 --sides fiude --models CONN UONN SONN --transfer
# Priority 3: fiude US num=2 replicates
run_group --regions US --nums 2 --sides fiude --models CONN UONN SONN --transfer
# Priority 4: hhs num=2, both sides (torch hhs num=2 never ran either)
run_group --regions hhs --nums 2 --sides torch fiude --models CONN UONN SONN --transfer

echo "[queue] all groups attempted; exiting $(date -u)" >> "$LOG"
