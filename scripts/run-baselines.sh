#!/usr/bin/env bash
# CPU baseline sweeps (reference scripts/run-python-baselines.sh analog).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p baseline_results
for op in filter join sum take; do
  echo "--- $op ---" >&2
  python "baseline/$op.py" | tee "baseline_results/$op.csv"
done
