#!/usr/bin/env python3
"""Oracle-dtype contract gate.

Usage: python3 scripts/dtype_gate.py <sfDir> <outDir>

For every oracle in <outDir>/oracle_sql.json, compares the pandas dtypes
of the Spark result parquet (<outDir>/<name>) against the dtypes of the
DuckDB oracle frame — exactly the two frames the driver's hash-compare
sees (columns sorted by name). Values are NOT compared here (check.py
does that); this gate exists because the driver hashes typed values, so
"numerically equal but differently typed" still fails the round.

The motivating class (g08, rounds 10-11): DuckDB's SUM over BIGINT
returns HUGEINT, which lands in the comparison frame as float64 while
Spark writes int64 — rows_match true, hash false, two rounds lost.
A missing CAST on either side now fails HERE, at sf0.001, in seconds.
"""
import sys, json, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        if os.path.exists(f"{out_dir}/{name}/_FAILED"):
            print(f"FAILED  {name}: Spark query failed in Verify")
            n_bad += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            want = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ERROR   {name}: {e}")
            n_bad += 1
            continue
        if sorted(got.columns) != sorted(want.columns):
            print(f"SCHEMA  {name}: spark={sorted(got.columns)} "
                  f"oracle={sorted(want.columns)}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        g = [str(d) for d in got.dtypes]
        w = [str(d) for d in want.dtypes]
        if g != w:
            diff = {c: (a, b) for c, a, b in zip(got.columns, g, w) if a != b}
            print(f"DTYPE   {name}: spark vs oracle per column: {diff}")
            n_bad += 1
        else:
            n_ok += 1
    print(f"\n{n_ok} dtype-ok, {n_bad} bad")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
