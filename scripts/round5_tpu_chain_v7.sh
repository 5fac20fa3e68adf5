#!/bin/bash
# Round-5 chip chain v7 (post-reboot session): fill the results table to
# reference volume.  All sweep units dedup via --skip-done against the
# results CSV itself (the /tmp ledgers did not survive the reboot), use a
# FRESH work dir per invocation, and run under the advisory chip lock in
# bounded units so any driver bench can still acquire the chip.
#
# An off-chip CPU tune_worker (see /tmp/cpu_tuner.sh) soaks the tuning grid
# in parallel; the file-locked claim protocol dedups across the pool.
#
# Usage: scripts/round5_tpu_chain_v7.sh <deadline-epoch-seconds> [log]
set -u
cd "$(dirname "$0")/.."
DEADLINE=${1:?deadline epoch required}
LOG=${2:-/tmp/tpu_chain_r5g.log}

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
  probe_tpu || { echo "[chain7] tunnel down before $label" >> "$LOG"; sleep 120; return 1; }
  local budget=$(( left - 150 ))
  [ "$budget" -gt "$cap" ] && budget=$cap
  echo "[chain7] $(date -u +%H:%M:%S) start $label (budget ${budget}s)" >> "$LOG"
  timeout "$budget" "$@" >> "$LOG" 2>&1
  echo "[chain7] $(date -u +%H:%M:%S) $label rc=$?" >> "$LOG"
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
  echo "[chain7] ===== pass $PASS ($(remaining))s left =====" >> "$LOG"

  # 1. finish the 6-family x US+hhs x {2015,2016} window-7 60-epoch block
  sweep 1200 hhs-w7 --regions hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2015 2016 --epochs 60 --windows 7 --nums 1 2 3

  # 2. state 2016 (all 6 families) — family ordering at state scale
  sweep 1500 state16 --regions state --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 7 --nums 1 2 3

  # 3. window-22 spread, US+hhs 2016 (new rows)
  sweep 1500 w22 --regions US hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 22 --nums 1 2 3

  # 4. window-1 spread, US 2016 (new rows)
  sweep 1200 w1 --regions US --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2016 --epochs 60 --windows 1 --nums 1 2 3

  # 5. season fill 2017/2018 on the US+hhs window-7 60-epoch grid
  sweep 1500 w7-1718 --regions US hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2017 2018 --epochs 60 --windows 7 --nums 1 2 3

  # 6. window-22 season spread 2015 (densify the new rows)
  sweep 1500 w22-15 --regions US hhs --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2015 --epochs 60 --windows 22 --nums 1 2 3

  # 7. state 2017/2018 season fill
  sweep 1500 state1718 --regions state --models CONN UONN SONN CONNb UONNb SONNb \
      --seasons 2017 2018 --epochs 60 --windows 7 --nums 1 2 3

  # 8. one on-chip tuning unit per pass as filler (claims dedup with the
  #    off-chip CPU worker via the CSV lock)
  unit 900 tuning python scripts/tune_worker.py 0 \
      --csv docs/validation_scores_synth.csv --max-rows 12 --chip-lock
done
echo "[chain7] done; exiting $(date -u)" >> "$LOG"
