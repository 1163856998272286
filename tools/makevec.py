#!/usr/bin/env python3
"""Vectors-only ladder corpus: N perturbed replicas of sf0.1's
embeddings table (same perturbation scheme as make8x.py — replica-
deterministic epsilon so replicas are near- but not exact dups).
Driver-side tooling (duckdb), NOT part of the library.

Usage: python3 tools/makevec.py <outDir> <replicas> [threads]
"""
import os
import sys

import duckdb

OFF = 10_000_000
SRC = "/root/testdata/sf0.1"


def main() -> None:
    out = sys.argv[1]
    reps = int(sys.argv[2])
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {threads}")
    # cross join with a replica index instead of N UNION ALL arms
    # (4096 arms trip duckdb's max_expression_depth)
    sql = f"""
      SELECT vec_id + k * {OFF}::BIGINT AS vec_id,
             list_transform(embedding,
               x -> x + (k * 0.001)::FLOAT) AS embedding
      FROM read_parquet('{SRC}/embeddings.parquet')
      CROSS JOIN (SELECT unnest(range({reps})) AS k)"""
    con.execute(
        f"COPY ({sql}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')"
    ).fetchone()[0]
    print(f"embeddings: {n} rows -> {out}")


if __name__ == "__main__":
    main()
