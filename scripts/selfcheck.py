#!/usr/bin/env python3
"""Local self-check mimicking the driver's DuckDB-oracle compare:
for each query with an oracleSql entry, run the SQL in DuckDB over the
sf tables and compare (columns sorted by name, rows as written) against
the Spark parquet output. Usage: selfcheck.py <sfDir> <verifyOut>"""
import sys, json, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
skipped = 0
for name, sql in sorted(oracle.items()):
    import os as _os
    if not _os.path.isdir(f"{out_dir}/{name}"):
        # SPARK_GRAFT_ONLY subset run: no output dir means the query was
        # not run, not that it failed (Verify prints real run errors)
        skipped += 1
        continue
    try:
        got = duckdb.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"load/run error: {e}"))
        continue
    g = got[sorted(got.columns)]
    e = exp[sorted(exp.columns)]
    if list(g.columns) != list(e.columns):
        fails.append((name, f"columns differ: {list(g.columns)} vs {list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((name, f"row count {len(g)} vs {len(e)}"))
        continue
    # compare row-by-row (both should be deterministic/ordered) after a
    # stable sort on all columns to be safe
    g = g.sort_values(by=list(g.columns), ignore_index=True)
    e = e.sort_values(by=list(e.columns), ignore_index=True)
    bad = None
    for c in g.columns:
        gv, ev = g[c], e[c]
        for i in range(len(gv)):
            a, b = gv.iloc[i], ev.iloc[i]
            if a is None and b is None:
                continue
            try:
                if isinstance(a, float) or isinstance(b, float):
                    fa, fb = float(a), float(b)
                    if math.isnan(fa) and math.isnan(fb):
                        continue
                    if fa != fb:
                        bad = (c, i, a, b); break
                elif str(a) != str(b):
                    bad = (c, i, a, b); break
            except Exception:
                if str(a) != str(b):
                    bad = (c, i, a, b); break
        if bad:
            break
    if bad:
        fails.append((name, f"value mismatch col={bad[0]} row={bad[1]}: {bad[2]!r} vs {bad[3]!r}"))
    else:
        print(f"OK   {name}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
ran = len(oracle) - skipped
print(f"\n{ran-len(fails)}/{ran} oracle queries match" +
      (f" ({skipped} not run)" if skipped else ""))
# rows-only queries: just report counts
import glob, os
for d in sorted(os.listdir(out_dir)):
    p = os.path.join(out_dir, d)
    if os.path.isdir(p) and d not in oracle:
        n = duckdb.sql(f"SELECT count(*) FROM '{p}/*.parquet'").fetchone()[0]
        print(f"rows-only {d}: {n} rows")
sys.exit(1 if fails else 0)
