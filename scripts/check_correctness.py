#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (done by
caller via sbt), then execute each oracle_sql.json entry in DuckDB over
the same parquet tables and diff against the Spark parquet output
(columns sorted by name, rows sorted by all columns, exact values).

Usage: python3 scripts/check_correctness.py <sfDir> <outDir> [only,csv]

The optional third arg restricts the run to named queries (the 10x
heavy-gate workflow, where single oracle queries cost minutes and get
split across processes). Every name must exist in oracle_sql.json —
a typo'd filter fails instead of vacuously passing. Per-query wall
timing is always printed; output is line-buffered for tail -f.
"""
import json, sys, glob, os, time
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
if only is not None:
    unknown = only - set(oracle)
    if not only or unknown:
        print(f"FAIL: bad 'only' filter — unknown queries {sorted(unknown)}"
              if unknown else "FAIL: empty 'only' filter", flush=True)
        sys.exit(2)
fail = checked = 0
for name, sql in sorted(oracle.items()):
    if only is not None and name not in only:
        continue
    checked += 1
    t0 = time.time()
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output", flush=True); fail += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}", flush=True); fail += 1; continue
    dt = time.time() - t0
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}",
              flush=True)
        fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)} ({dt:.1f}s)",
              flush=True); fail += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    # exact compare; allow dtype coercion (int32 vs int64 etc.)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=True)
        print(f"OK   {name} ({len(got)} rows, {dt:.1f}s)", flush=True)
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'diff'} ({dt:.1f}s)",
              flush=True)
        # show first few mismatches for debugging
        for col in g.columns:
            neq = (g[col] != w[col])
            try:
                both_nan = g[col].isna() & w[col].isna()
                neq = neq & ~both_nan
            except Exception:
                pass
            if neq.any():
                i = neq.idxmax()
                print(f"  col {col}: row {i}: spark={g[col][i]!r} oracle={w[col][i]!r} ({int(neq.sum())} diffs)",
                      flush=True)
        fail += 1
print(f"{'PASS' if fail == 0 else 'FAIL'}: {checked - fail}/{checked} queries match",
      flush=True)
sys.exit(1 if fail else 0)
