#!/usr/bin/env bash
# Native-engine baseline SF sweep (reference scripts/run-cpp-baselines.sh
# analog: there BM_{Join,Filter,Sum,Take}Native swept SF 1..2048 through
# Google Benchmark; here the pyarrow-engine operator oracles sweep through
# the registered suite, one JSON line per point into bench_results.json
# rows tagged by sf).
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${OUT:-native_sweep.jsonl}
: > "$OUT"
for SF in ${SFS:-1 2 4 8}; do
  echo "--- SF=$SF ---" >&2
  python scripts/run_benchmarks.py --filter '_native' --sf "$SF" | tee -a "$OUT"
done
echo "results in $OUT" >&2
