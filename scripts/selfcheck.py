#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate (NOT part of the
library): run Verify's parquet dumps against the DuckDB oracle SQL and
compare order-insensitively with columns sorted by name.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    got_path = f"{out_dir}/{name}"
    if not os.path.isdir(got_path):
        print(f"FAIL {name}: no spark output dir")
        fails += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet('{got_path}/*.parquet')").fetchdf()
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fails += 1
        continue

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df

    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
        fails += 1
    elif len(g) != len(e):
        print(f"FAIL {name}: rows {len(g)} != {len(e)}")
        fails += 1
    else:
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"OK   {name}: {len(g)} rows")
        except AssertionError as ex:
            print(f"FAIL {name}: value mismatch: {str(ex)[:300]}")
            fails += 1
print("PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
