#!/usr/bin/env bash
# Full release gate for this repo — run after the LAST commit touching
# src/main or the oracle SQL in a round (SCALE.md "Release-process rule"):
#
#   1. full ScalaTest suite
#   2. Verify dump at sf0.01 + DuckDB oracle compare (the driver's gate)
#   3. full Bench at sf0.1 (JSON line on stdout)
#
# Exits non-zero on the first red. Timestamps printed for the SCALE.md
# record. Usage: tools/gate.sh [outdir]   (default /tmp/graft_gate)
set -euo pipefail
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/graft_gate}"
mkdir -p "$OUT"

stamp() { date -u +%Y-%m-%dT%H:%M:%SZ; }

echo "gate: sbt test start $(stamp)"
sbt -batch test > "$OUT/sbt_test.log" 2>&1 || {
  grep -E "Tests:|FAILED|Failed tests" "$OUT/sbt_test.log" | tail -10
  echo "gate: sbt test RED"; exit 1; }
grep -E "Tests: succeeded" "$OUT/sbt_test.log" | tail -1
echo "gate: sbt test end $(stamp)"

echo "gate: verify start $(stamp)"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-8}" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT/verify" \
  > "$OUT/verify.log" 2>&1 || { tail -5 "$OUT/verify.log"; echo "gate: verify RED"; exit 1; }
grep -E '\[verify\]' "$OUT/verify.log" || true   # per-query failures, if any
python3 tools/check_oracle.py /root/testdata/sf0.01 "$OUT/verify" \
  > "$OUT/oracle.log" 2>&1 || { grep "^FAIL" "$OUT/oracle.log" | head -20; echo "gate: oracle RED"; exit 1; }
tail -1 "$OUT/oracle.log"
echo "gate: verify end $(stamp)"

echo "gate: bench start $(stamp)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="${BENCH_CPUS:-32}" \
  sbt -batch 'runMain graft.Bench' 2> "$OUT/bench.err" | grep -F '"metric"' | tee "$OUT/bench.json"
echo "gate: bench end $(stamp)"
echo "gate: ALL GREEN"
