#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify (done
separately via sbt), then execute each oracle_sql.json query in DuckDB
over the same parquet tables and compare row counts, sorted-column
value hashes, and schemas. Usage:

    python3 tools/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize ints/floats; round floats to kill representation noise
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_red_flags(s: pd.DataFrame, o: pd.DataFrame) -> list:
    """Driver-strictness checks the value comparison can't see
    (VERDICT r10): the driver hashes raw values, so (a) a column that
    is float64 on one side but int64/object on the other diverges even
    when bit-identical at the source (DuckDB HUGEINT/DECIMAL(38,0) →
    pandas float64), and (b) any numeric column with >18-digit values
    exceeds float64's exact-integer range and WILL take that path in
    some pandas/duckdb version. Flag both classes as failures."""
    flags = []
    for c in s.columns:
        if c not in o.columns:
            continue
        sd, od = s[c].dtype, o[c].dtype
        s_f, o_f = (pd.api.types.is_float_dtype(d) for d in (sd, od))
        s_i, o_i = (pd.api.types.is_integer_dtype(d) for d in (sd, od))
        if (o_f and (s_i or sd == object)) or (s_f and (o_i or od == object)):
            flags.append(f"dtype-skew {c}: spark={sd} oracle={od}")
        for tag, col in (("spark", s[c]), ("oracle", o[c])):
            if pd.api.types.is_bool_dtype(col.dtype):
                continue
            if pd.api.types.is_numeric_dtype(col.dtype) or col.dtype == object:
                try:
                    vals = col.dropna()
                    if len(vals) and float(max(abs(v) for v in vals)) >= 1e18:
                        flags.append(
                            f"magnitude {c} ({tag}): >18-digit values")
                except (TypeError, ValueError):
                    pass  # non-numeric object column (strings, arrays)
    return flags


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name in sorted(oracles):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            oracle_df = con.execute(oracles[name]).fetchdf()
            s, o = canon(spark_df), canon(oracle_df)
            rows = len(s) == len(o)
            cols = list(s.columns) == list(o.columns)
            if rows and cols:
                flags = dtype_red_flags(s, o)
                try:
                    pd.testing.assert_frame_equal(
                        s, o, check_dtype=False, check_exact=False,
                        rtol=0, atol=1e-9)
                    match = not flags
                    detail = "; ".join(flags)
                except AssertionError as e:
                    match = False
                    detail = str(e).split("\n")[0]
            else:
                match = False
                detail = f"rows {len(s)} vs {len(o)}; cols {list(s.columns)} vs {list(o.columns)}"
            status = "OK  " if match else "FAIL"
            if not match:
                failures += 1
            print(f"{status} {name}: spark={len(s)} oracle={len(o)} {detail[:200]}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:300]}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
