#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

For each query result parquet in <verifyOutDir>, runs the matching oracle
SQL from oracle_sql.json in DuckDB against the sf parquet tables, then
compares at DRIVER strictness (learned from round 1, where a tolerant
pandas compare passed two queries the driver hash-failed):
  - column names (sorted) must match;
  - row counts must match;
  - after sorting rows by all columns, every value must be EXACTLY equal
    (floats bit-exact — the driver hashes values, so ~1e-14 summation-
    order noise fails; round on BOTH sides in the query when an agg is
    order-dependent);
  - null vs NaN are DIFFERENT values (pandas folds both to NaN, the
    driver does not — compare via pyarrow null masks);
  - int-vs-float dtype mismatches (e.g. DuckDB HUGEINT → float64) fail.
This is builder-side tooling only — the shipped Scala library never uses
python.
"""
import json
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_spark(res_dir: Path) -> pa.Table:
    files = sorted(res_dir.glob("*.parquet"))
    return pa.concat_tables([pq.read_table(f) for f in files])


def sort_order(df: pd.DataFrame) -> np.ndarray:
    keys = []
    for c in reversed(df.columns.tolist()):
        v = df[c]
        if pd.api.types.is_datetime64_any_dtype(v):
            keys.append(v.values.astype("datetime64[us]").astype(np.int64))
        elif v.dtype == object:
            keys.append(v.fillna("").astype(str).values)
        else:
            keys.append(np.nan_to_num(v.values.astype(float), nan=np.inf)
                        if v.dtype.kind == "f" else v.values)
    return np.lexsort(keys)


def compare(name: str, spark_t: pa.Table, duck_t: pa.Table) -> list:
    problems = []
    scols, dcols = sorted(spark_t.column_names), sorted(duck_t.column_names)
    if scols != dcols:
        return [f"SCHEMA got={scols} want={dcols}"]
    spark_t = spark_t.select(scols)
    duck_t = duck_t.select(scols)
    if spark_t.num_rows != duck_t.num_rows:
        return [f"ROWS got={spark_t.num_rows} want={duck_t.num_rows}"]
    sdf, ddf = spark_t.to_pandas(), duck_t.to_pandas()
    snull = {c: np.array(spark_t[c].is_null()) for c in scols}
    dnull = {c: np.array(duck_t[c].is_null()) for c in scols}
    so, do = sort_order(sdf), sort_order(ddf)
    for c in scols:
        st, dt = spark_t.schema.field(c).type, duck_t.schema.field(c).type
        s_int = pa.types.is_integer(st)
        d_int = pa.types.is_integer(dt)
        if s_int != d_int:
            problems.append(f"{c}: dtype {st} vs {dt} (int/float mismatch "
                            "— driver hash is repr-sensitive)")
            continue
        sv, dv = sdf[c].values[so], ddf[c].values[do]
        sn, dn = snull[c][so], dnull[c][do]
        nm = int((sn != dn).sum())
        if nm:
            problems.append(f"{c}: {nm} null-mask diffs (null vs NaN?)")
        both = ~sn & ~dn
        if sdf[c].dtype.kind == "f":
            a, b = sv[both].astype(float), dv[both].astype(float)
            nanm = int((np.isnan(a) != np.isnan(b)).sum())
            if nanm:
                problems.append(f"{c}: {nanm} NaN-mask diffs")
            num = ~np.isnan(a) & ~np.isnan(b)
            ne = int((a[num] != b[num]).sum())
            if ne:
                d = np.abs(a[num] - b[num])
                tol = "within 1e-5 rtol (driver WILL fail this)" \
                    if np.allclose(a[num], b[num], rtol=1e-5, atol=1e-8) \
                    else "BEYOND tolerance"
                problems.append(f"{c}: {ne} not bit-exact, maxabs={d.max():.2e} ({tol})")
            negz = int(np.sum((a == 0) & np.signbit(a)) + np.sum((b == 0) & np.signbit(b)))
            if negz:
                problems.append(f"{c}: {negz} negative zeros")
        elif pd.api.types.is_datetime64_any_dtype(sdf[c]):
            ne = int((sv[both].astype("datetime64[us]")
                      != dv[both].astype("datetime64[us]")).sum())
            if ne:
                problems.append(f"{c}: {ne} value diffs")
        else:
            ne = int((sv[both] != dv[both]).sum())
            if ne:
                problems.append(f"{c}: {ne} value diffs")
    return problems


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
        got = load_spark(res_dir)
        want = con.execute(oracles[name]).fetch_arrow_table()
        problems = compare(name, got, want)
        if problems:
            failures += 1
            print(f"[FAIL] {name}: rows={got.num_rows} " + "; ".join(problems))
        else:
            print(f"[ok  ] {name}: rows={got.num_rows}")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
