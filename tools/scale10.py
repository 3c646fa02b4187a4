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

With --perturb, replica copies of documents.text are NEAR-duplicates
instead of verbatim twins: replica i > 0 drops the leading token and
appends one replica-unique token (2 token edits on a ~100-token doc,
Jaccard ~0.95+). Verbatim twins measure the quadratic-in-duplication
pair blowup of the generator, not the engine; the perturbed corpus is
the realistic crawl shape (boilerplate + near-copies), so dedup-family
scale ratios against it are interpretable.

Usage: python3 tools/scale10.py /root/testdata/sf0.1 /tmp/sf1 [factor] [--perturb]
"""
import glob
import os
import sys

import duckdb

def main(src: str, dst: str, factor: int = 10, perturb: bool = False) -> None:
    os.makedirs(dst, exist_ok=True)
    off = 100_000_000
    for path in sorted(glob.glob(f"{src}/*.parquet")):
        name = os.path.basename(path)[: -len(".parquet")]
        cols = duckdb.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        sel = []
        for c, _typ, *_ in cols:
            if c.endswith("key") or c.endswith("_id"):
                sel.append(f'("{c}" + i * {off})::BIGINT AS "{c}"')
            elif perturb and name == "documents" and c == "text":
                sel.append(
                    'CASE WHEN i = 0 THEN "text" ELSE '
                    "CASE WHEN position(' ' IN \"text\") > 0 "
                    "THEN substr(\"text\", position(' ' IN \"text\") + 1) "
                    'ELSE "text" END '
                    "|| ' zz' || i::VARCHAR || 'q' || "
                    '("doc_id" % 1000)::VARCHAR END AS "text"')
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
    args = [a for a in sys.argv[1:] if a != "--perturb"]
    perturb = "--perturb" in sys.argv
    factor = int(args[2]) if len(args) > 2 else 10
    main(args[0], args[1], factor, perturb)
