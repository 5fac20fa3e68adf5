#!/usr/bin/env bash
# Multi-worker sweep fan-out (reference run_stuff_linux.sh:3-6 launched 24
# background python processes; tuning/run_tuning.sh launched 36).
#
# On TPU the device-parallel path is PopulationTrainer (one program, many
# members); this script remains for host-level elasticity — N processes (or
# N hosts on a shared filesystem) coordinate through the same file ledger.
#
# Usage: scripts/run_workers.sh [n_workers] [extra run_sweep.py args...]
set -euo pipefail
N=${1:-4}
shift || true
for i in $(seq 1 "$N"); do
  python "$(dirname "$0")/run_sweep.py" "$@" &
done
wait
