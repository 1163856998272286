#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on the same parquet tables, executes each oracle from
outDir/oracle_sql.json, and compares against the Spark result parquet
(columns sorted by name, rows sorted by all columns, exact equality
after normalizing types). Usage:

    python3 tools/check.py <sfDir> <outDir> [query ...]
"""
import json, sys, glob, math
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (int, str, bool)):
        return v
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(("" if x is None else str(x)) for x in t))
    return [cols[i] for i in order], out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        tbl = pq.read_table(files[0] if len(files) == 1 else files)
        s_cols = list(tbl.column_names)
        s_rows = [tuple(r[c] for c in s_cols) for r in tbl.to_pylist()]
        try:
            res = con.execute(sql)
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sr = norm_rows(s_cols, s_rows)
        dc, dr = norm_rows(d_cols, d_rows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        if sr == dr:
            print(f"PASS {name}: {len(sr)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}; cols={sc}")
            for i, (a, b) in enumerate(zip(sr, dr)):
                if a != b:
                    print(f"  first diff at sorted row {i}:\n    spark={a}\n    duck ={b}")
                    break
            else:
                src = sr if len(sr) > len(dr) else dr
                which = "spark" if len(sr) > len(dr) else "duck"
                print(f"  extra {which} row: {src[min(len(sr), len(dr))]}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
