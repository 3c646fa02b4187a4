#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>, runs the matching oracle
SQL from oracle_sql.json in DuckDB against the sf parquet tables, then
compares: row count, column names (sorted), and values (rows sorted by all
columns, floats rounded). This is builder-side tooling only — the shipped
Scala library never uses python.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [str(c) for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64")  # int/long width differences
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracles):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"[FAIL] {name}: no result dir")
            failures += 1
            continue
        got = norm(pd.read_parquet(res_dir))
        want = norm(con.execute(oracles[name]).fetchdf())
        status = "OK"
        if list(got.columns) != list(want.columns):
            status = f"SCHEMA got={list(got.columns)} want={list(want.columns)}"
        elif len(got) != len(want):
            status = f"ROWS got={len(got)} want={len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False,
                    rtol=1e-5, atol=1e-8)
            except AssertionError as e:
                status = "VALUES " + str(e).split("\n")[0]
        tag = "ok  " if status == "OK" else "FAIL"
        if status != "OK":
            failures += 1
        print(f"[{tag}] {name}: rows={len(got)} {status if status != 'OK' else ''}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
