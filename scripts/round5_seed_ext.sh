#!/bin/bash
# Round-5 (post-reboot) seed extension for the three contested h2h families
# at the current aggregate: hhs UONN (torch +0.30 at n=4, fiude won 3/4
# paired seeds — one fiude blowup skews the median), US CONN (torch median
# rests on n=3-of-4 convergent cells), US SONN (torch +0.59 at n=6).
#
# torch cells are pure-CPU and expensive (~25-40 min nice'd on this
# single-core host) so they run loser-first; fiude cells ride the TPU under
# the advisory chip lock (head_to_head.py acquires it automatically) and
# interleave with the round5_tpu_chain_v7 sweep units.
#
# Usage: scripts/round5_seed_ext.sh <deadline-epoch-seconds> <torch|fiude> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
SIDE=${2:?side required: torch|fiude}
LOG=${3:-/tmp/h2h_seed_ext_${SIDE}.log}

run_group() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "[seedext-$SIDE] deadline passed; not starting: $*" >> "$LOG"
    return 1
  fi
  echo "[seedext-$SIDE] $(date -u +%H:%M:%S) start: $*" >> "$LOG"
  local plat=ambient nice_n=0
  if [ "$SIDE" = torch ]; then plat=cpu; nice_n=10; fi
  timeout $(( DEADLINE - $(date +%s) )) nice -n "$nice_n" \
      python scripts/head_to_head.py \
      --tree /tmp/h2h --out docs/head_to_head --resume \
      --weights-root /tmp/h2h_runs --platform "$plat" --sides "$SIDE" \
      "$@" >> "$LOG" 2>&1
  echo "[seedext-$SIDE] $(date -u +%H:%M:%S) rc=$?: $*" >> "$LOG"
}

# Multiple passes: fiude cells can lose a chip-lock race against a sweep
# unit (chip_lock(timeout=1800) raises) — --resume dedups completed cells,
# so re-running a finished group is a no-op row_exists scan.
for PASS in 1 2 3 4; do
  echo "[seedext-$SIDE] pass $PASS" >> "$LOG"
  run_group --regions hhs --models UONN --nums 5 6
  run_group --regions US  --models CONN --nums 5 6
  run_group --regions US  --models SONN --nums 7 8
  [ "$(date +%s)" -ge "$DEADLINE" ] && break
  [ "$SIDE" = torch ] && break   # torch groups run to completion first try
done
echo "[seedext-$SIDE] done $(date -u)" >> "$LOG"
