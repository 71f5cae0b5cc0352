#!/usr/bin/env bash
# Full local reproduction of the driver's gate:
#   compile → tests → Verify@sf0.01 → DuckDB selfcheck → Bench@sf0.1
# Usage: scripts/driver_cycle.sh [cpus]
set -euo pipefail
cd "$(dirname "$0")/.."
CPUS="${1:-16}"

echo "== compile + test =="
sbt -batch test

echo "== verify @ sf0.01 =="
OUT=$(mktemp -d)/verify
SPARK_GRAFT_CPUS="$CPUS" sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $OUT"

echo "== duckdb selfcheck =="
python3 scripts/selfcheck.py /root/testdata/sf0.01 "$OUT"

echo "== bench @ sf0.1 =="
BENCH_OUT=$(mktemp)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" | grep -F '"metric"' | tee "$BENCH_OUT"

echo "== bench guardrail vs last recorded round =="
LAST_BENCH=$(ls BENCH_r*.json 2>/dev/null | sort | tail -1 || true)
if [ -n "$LAST_BENCH" ]; then
  scripts/bench_compare.sh "$LAST_BENCH" "$BENCH_OUT"
else
  echo "no recorded BENCH_r*.json baseline — skipping compare"
fi
