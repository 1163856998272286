#!/usr/bin/env python3
"""Build the 8x scale-probe corpus at /tmp/graft8x from sf0.1.

Driver-side tooling only (duckdb) -- NOT part of the library. Eight
disjoint replicas of every table, keeping referential integrity:

- star schema: keys offset by replica * OFF so orders still join
  customers, lineitem still joins orders/suppliers/parts, and the
  derived customer->supplier graph becomes 8 disjoint copies
  (region/nation stay shared dims, TPC-H-style);
- documents: doc_id offset AND every token prefixed r<k> for k>0, so
  replica token spaces are disjoint (cross-replica n-grams/minhash
  collisions would otherwise make every dedup probe its own worst
  case -- measured in round 3);
- events: event_id/user_id offset (8x the users, same time range);
- embeddings: vec_id offset, every coordinate shifted by a replica-
  deterministic epsilon (k * 0.001) so replicas are near- but not
  exact duplicates (identical replicas inflate LSH pair output x64,
  quadratic in multiplicity -- round-3 finding).

Usage: python3 tools/make8x.py [outDir] [srcDir] [replicas]
"""
import os
import sys

import duckdb

OFF = 10_000_000
OFFSQL = "10000000::BIGINT"  # BIGINT literal: k*OFF overflows INT32 past k=214 (512x probes)

def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft8x"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    def rep(table: str, select: str) -> None:
        sql = " UNION ALL ".join(
            select.format(k=k, src=f"'{src}/{table}.parquet'")
            for k in range(reps))
        con.execute(
            f"COPY ({sql}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)")
        print(f"{t}: shared dim copied")

    o = OFF
    rep("customer",
        "SELECT c_custkey + {k} * " + OFFSQL + " AS c_custkey, c_name, "
        "c_nationkey, c_acctbal, c_mktsegment FROM {src}")
    rep("supplier",
        "SELECT s_suppkey + {k} * " + OFFSQL + " AS s_suppkey, s_name, "
        "s_nationkey, s_acctbal FROM {src}")
    rep("part",
        "SELECT p_partkey + {k} * " + OFFSQL + " AS p_partkey, p_name, "
        "p_brand, p_type, p_size, p_retailprice FROM {src}")
    rep("orders",
        "SELECT o_orderkey + {k} * " + OFFSQL + " AS o_orderkey, "
        "o_custkey + {k} * " + OFFSQL + " AS o_custkey, o_orderstatus, "
        "o_totalprice, o_orderdate, o_orderpriority FROM {src}")
    rep("lineitem",
        "SELECT l_orderkey + {k} * " + OFFSQL + " AS l_orderkey, "
        "l_partkey + {k} * " + OFFSQL + " AS l_partkey, "
        "l_suppkey + {k} * " + OFFSQL + " AS l_suppkey, l_linenumber, "
        "l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, "
        "l_linestatus, l_shipdate FROM {src}")
    rep("events",
        "SELECT event_id + {k} * " + OFFSQL + " AS event_id, ts, "
        "user_id + {k} * " + OFFSQL + " AS user_id, event_type, value, "
        "props FROM {src}")
    # k=0 keeps the original text; k>0 prefixes every token
    rep("documents",
        "SELECT doc_id + {k} * " + OFFSQL + " AS doc_id, "
        "CASE WHEN {k} = 0 THEN text ELSE "
        "array_to_string(list_transform(string_split(text, ' '), "
        "t -> 'r{k}' || t), ' ') END AS text, "
        "lang, source, length(CASE WHEN {k} = 0 THEN text ELSE "
        "array_to_string(list_transform(string_split(text, ' '), "
        "t -> 'r{k}' || t), ' ') END) AS n_chars FROM {src}")
    rep("embeddings",
        "SELECT vec_id + {k} * " + OFFSQL + " AS vec_id, "
        "list_transform(embedding, x -> x + {k} * 0.001::FLOAT) "
        "AS embedding, label FROM {src}")
    print(f"done -> {out}")

if __name__ == "__main__":
    main()
