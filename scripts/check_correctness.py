#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (done by
caller via sbt), then execute each oracle_sql.json entry in DuckDB over
the same parquet tables and diff against the Spark parquet output
(columns sorted by name, rows sorted by all columns, exact values).

Usage: python3 scripts/check_correctness.py <sfDir> <outDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fail += 1; continue
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fail += 1; continue
    g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
    w = want.sort_values(by=list(want.columns)).reset_index(drop=True)
    # exact compare; allow dtype coercion (int32 vs int64 etc.)
    try:
        pd.testing.assert_frame_equal(g, w, check_dtype=False,
                                      check_exact=True)
        print(f"OK   {name} ({len(got)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else 'diff'}")
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
                print(f"  col {col}: row {i}: spark={g[col][i]!r} oracle={w[col][i]!r} ({int(neq.sum())} diffs)")
        fail += 1
print(f"{'PASS' if fail == 0 else 'FAIL'}: {len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
