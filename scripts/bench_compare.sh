#!/usr/bin/env bash
# Per-query bench guardrail: compare a current bench JSON against a
# recorded baseline and FAIL on any query regressing >2x that is not
# declared in BENCH_TRADES (deliberate, explained trades — e.g. paying
# time for recall). New queries (no baseline entry) are reported, never
# failed. Usage:
#   scripts/bench_compare.sh <baseline.json> <current.json> [trades_file]
set -euo pipefail
BASE="${1:?baseline bench json}"
CUR="${2:?current bench json}"
TRADES="${3:-$(cd "$(dirname "$0")/.." && pwd)/BENCH_TRADES}"

python3 - "$BASE" "$CUR" "$TRADES" <<'PY'
import json, sys, os

def load_queries(path):
    # Accepted shapes: a bare bench object; the driver's BENCH_r*.json
    # wrapper (bench line embedded in its "tail" log string); or
    # one-JSON-line-among-logs (raw/sbt-prefixed bench output).
    with open(path) as f:
        text = f.read()
    try:
        obj = json.loads(text)
        if isinstance(obj, dict):
            if "queries" in obj:
                return obj["queries"]
            for line in (obj.get("tail") or "").splitlines():
                i = line.find("{")
                if i >= 0 and '"queries"' in line:
                    return json.loads(line[i:])["queries"]
    except json.JSONDecodeError:
        pass
    for line in text.splitlines():
        i = line.find("{")
        if i >= 0 and '"queries"' in line:
            try:
                return json.loads(line[i:])["queries"]
            except json.JSONDecodeError:
                pass
    # Last resort: the driver may store a TRUNCATED log tail (the bench
    # line cut mid-JSON, quotes backslash-escaped inside the wrapper
    # string). Per-query keys are distinctive enough to recover by
    # pattern — values are bench seconds, never row data.
    import re
    pairs = re.findall(r'\\?"(q\d+_\w+)\\?"\s*:\s*([0-9.eE+-]+)', text)
    if pairs:
        out = {}
        for k, v in pairs:  # dict-comp last-wins would hide dupes
            out.setdefault(k, float(v))
        dupes = len(pairs) - len(out)
        print(f"WARNING: {path}: no parseable bench JSON line — regex "
              f"fallback recovered {len(out)} queries"
              + (f" ({dupes} duplicate keys ignored, first occurrence "
                 f"kept)" if dupes else "")
              + "; a truncated log may be MISSING queries after the cut",
              file=sys.stderr)
        return out
    raise SystemExit(f"no bench JSON line in {path}")

base = load_queries(sys.argv[1])
cur = load_queries(sys.argv[2])
trades = set()
if os.path.isfile(sys.argv[3]):
    with open(sys.argv[3]) as f:
        trades = {l.split()[0] for l in f
                  if l.strip() and not l.startswith("#")}

bad = []
for q in sorted(cur):
    t = cur[q]
    b = base.get(q)
    if b is None:
        print(f"NEW     {q}: {t:.2f}s (no baseline)")
        continue
    ratio = t / b if b > 0 else float("inf")
    flag = "OK"
    if ratio > 2.0:
        flag = "TRADE" if q in trades else "REGRESS"
        if flag == "REGRESS":
            bad.append(q)
    print(f"{flag:7s} {q}: {b:.2f}s -> {t:.2f}s ({ratio:.2f}x)")

gone = sorted(set(base) - set(cur))
for q in gone:
    print(f"GONE    {q}: was {base[q]:.2f}s, missing from current run")

if bad:
    print(f"\nFAIL: {len(bad)} undeclared >2x regression(s): "
          f"{', '.join(bad)}\nDeclare deliberate trades in BENCH_TRADES "
          f"(one query name + reason per line) or fix the regression.",
          file=sys.stderr)
    sys.exit(1)
if gone:
    print(f"\nFAIL: {len(gone)} quer(ies) missing from the current run.",
          file=sys.stderr)
    sys.exit(1)
print("\nbench-compare: no undeclared regressions")
PY
