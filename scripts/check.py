#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness check.

Usage: python3 scripts/check.py <sfDir> <outDir>
Compares each <outDir>/<name> parquet result against the oracle SQL in
<outDir>/oracle_sql.json run by DuckDB over the same tables. Columns are
sorted by name, rows sorted, values compared exactly (like the driver's
hash compare).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        res_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_files:
            print(f"MISSING {name}: no result parquet"); n_bad += 1; continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            want = norm(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"ERROR   {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA  {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"ROWS    {name}: spark={len(got)} oracle={len(want)}"); n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            print(f"OK      {name} ({len(got)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"VALUES  {name}: {str(e).splitlines()[-1][:200]}"); n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
