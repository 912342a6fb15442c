#!/usr/bin/env bash
# Device-count scaling sweep (reference scripts/run-upmem-scale.sh analog:
# there NR_DPUS swept 1..2048 per operator; here the device axis sweeps
# virtual or real mesh sizes for the distributed join — on a one-chip host
# run with FORCE_CPU=1 for the functional weak-scaling curve, on a pod
# slice leave it unset and DEVICES bounds the sweep at the real chips).
set -euo pipefail
cd "$(dirname "$0")/.."

DEVICES=${DEVICES:-8}
export SCALING_CURVE=1
if [ "${FORCE_CPU:-1}" = "1" ]; then
  export FORCE_CPU=1
fi
FORCE_CPU=${FORCE_CPU:-1} DEVICES=$DEVICES \
  python scripts/bench_multichip.py | tee MULTICHIP_SCALING.json
echo "results in MULTICHIP_SCALING.json" >&2
