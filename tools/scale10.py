#!/usr/bin/env python3
"""Replicate an sf directory 10x into a new directory for scale testing.

Each table is unioned from 10 shifted copies: every column named *key or
*_id is offset by replica * 100_000_000, so referential joins
(orders.o_orderkey = lineitem.l_orderkey, o_custkey = c_custkey, ...)
stay consistent within each replica and never collide across replicas.
Payload columns (dates, values, text, embeddings) are duplicated
verbatim, preserving per-replica distributions; text duplication makes
the dedup family work 10x harder (every doc gains 9 exact twins across
replicas), which is the interesting stress.

Usage: python3 tools/scale10.py /root/testdata/sf0.1 /tmp/sf1 [factor]
"""
import glob
import os
import sys

import duckdb

def main(src: str, dst: str, factor: int = 10) -> None:
    os.makedirs(dst, exist_ok=True)
    off = 100_000_000
    for path in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        cols = duckdb.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        sel = []
        for c, _typ, *_ in cols:
            if c.endswith("key") or c.endswith("_id"):
                sel.append(f'("{c}" + i * {off})::BIGINT AS "{c}"')
            else:
                sel.append(f'"{c}"')
        duckdb.sql(
            f"COPY (SELECT {', '.join(sel)} FROM '{path}' "
            f"CROSS JOIN generate_series(0, {factor - 1}) t(i)) "
            f"TO '{dst}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = duckdb.sql(f"SELECT count(*) FROM '{dst}/{name}.parquet'").fetchone()[0]
        print(f"[scale10] {name}: {n} rows")

if __name__ == "__main__":
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    main(sys.argv[1], sys.argv[2], factor)
