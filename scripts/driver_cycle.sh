#!/usr/bin/env bash
# Full local reproduction of the driver's gate:
#   compile → tests → Verify@sf0.01 → DuckDB selfcheck → Bench@sf0.1 ×2
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

# This VM's disk/CPU weather intermittently inflates single samples
# 1.5-2x (worst observed: 40x on one query) — a single run regularly
# manufactures fake regressions. Run the bench TWICE and compare/record
# the per-query MIN; both raw lines are kept alongside it.
echo "== bench @ sf0.1 (2 runs, per-query min) =="
BENCH_A=$(mktemp); BENCH_B=$(mktemp); BENCH_OUT=$(mktemp)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" | grep -F '"metric"' | tee "$BENCH_A"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="$CPUS" \
  sbt -batch "runMain graft.Bench" | grep -F '"metric"' | tee "$BENCH_B"
python3 - "$BENCH_A" "$BENCH_B" > "$BENCH_OUT" <<'PY'
import json, sys
runs = []
for p in sys.argv[1:3]:
    with open(p) as f:
        for line in f:
            i = line.find("{")
            if i >= 0 and '"queries"' in line:
                runs.append(json.loads(line[i:]))
                break
if len(runs) != 2:
    raise SystemExit(f"expected 2 bench lines, parsed {len(runs)}")
qmin = {q: min(r["queries"][q] for r in runs if q in r["queries"])
        for q in sorted(set(runs[0]["queries"]) | set(runs[1]["queries"]))}
out = dict(runs[0])
out["queries"] = qmin
out["value"] = sum(qmin.values())
out["samples"] = [r["queries"] for r in runs]
out["aggregation"] = "per-query min of 2 runs"
print(json.dumps(out))
PY
echo "-- min series --"
cat "$BENCH_OUT"

echo "== bench guardrail vs last recorded round =="
LAST_BENCH=$(ls BENCH_r*.json 2>/dev/null | sort | tail -1 || true)
if [ -n "$LAST_BENCH" ]; then
  scripts/bench_compare.sh "$LAST_BENCH" "$BENCH_OUT"
else
  echo "no recorded BENCH_r*.json baseline — skipping compare"
fi
