#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json query in DuckDB against the sfDir parquet tables,
loads the matching Spark-written parquet from verifyOutDir, sorts columns by
name and rows by all columns, and compares values. Dev-only tool — the real
gate is driver-side.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships flat files; ScaleDataGen writes part-file
        # directories for the big tables — glob those
        path = f"{sf_dir}/{t}.parquet"
        import os
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql).fetchdf()
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"FAIL {name}: cols want={list(w.columns)} got={list(g.columns)}")
            n_fail += 1
            continue
        if len(w) != len(g):
            print(f"FAIL {name}: rows want={len(w)} got={len(g)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(w, g, check_dtype=False,
                                          check_exact=True)
            print(f"OK   {name} ({len(w)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:400]}")
            n_fail += 1
    print(f"{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'} "
          f"({len(oracle)} queries)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
