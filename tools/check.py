#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs DuckDB on the same parquet tables, executes each oracle from
outDir/oracle_sql.json, and compares against the Spark result parquet
(columns sorted by name, rows sorted by all columns, exact equality
after normalizing types). Usage:

    python3 tools/check.py [--strict] <sfDir> <outDir> [query ...]

--strict additionally compares Arrow-level column TYPES between the
Spark parquet and the DuckDB result (fetched as Arrow). The driver's
hash is type-sensitive: DuckDB types bare integer sum() as HUGEINT
(Arrow decimal128), which hash-mismatches Spark's int64 even when
every value is equal — norm_cell coerces that away, so plain mode
cannot see it. Strict mode fails on any width/kind mismatch (int64 vs
decimal128, float32 vs float64, int32 vs int64); it unifies only
representation-identical families (string/large_string, date32 kinds)
and timestamp unit/tz, which the driver's value hash normalizes.
"""
import json, sys, glob, math, decimal
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
    # Arrow fetch hands DuckDB HUGEINT/DECIMAL back as Decimal; plain
    # mode stays value-lenient (strict mode flags the TYPE instead).
    if isinstance(v, decimal.Decimal):
        return int(v) if v == v.to_integral_value() else round(float(v), 6)
    return str(v)

def norm_type(t):
    """Collapse only families the driver's hash provably normalizes.

    Calibrated against CORRECTNESS_r04: int32-vs-int64 outputs (q7_window,
    t_token_stats, …) PASSED the driver's hash, while int64-vs-decimal128
    (s_sessionize, t_repetition) FAILED — so integer widths unify but
    integer-vs-decimal must stay a mismatch."""
    s = str(t)
    if s in ("int8", "int16", "int32", "int64",
             "uint8", "uint16", "uint32", "uint64"):
        return "int"
    if s in ("string", "large_string", "string_view"):
        return "string"
    if s in ("binary", "large_binary", "binary_view"):
        return "binary"
    if s.startswith("timestamp"):
        return "timestamp"
    if s.startswith("date"):
        return "date"
    if s.startswith("list<") or s.startswith("large_list<"):
        inner = s[s.index("<") + 1:-1]
        # strip the "item: " / "l: " field-name prefix
        if ": " in inner:
            inner = inner.split(": ", 1)[1]
        return f"list<{norm_type(inner)}>"
    return s

def type_check(name, s_schema, d_schema):
    """Strict Arrow type comparison (columns sorted by name).

    Returns a list of mismatch strings; empty = pass."""
    s_map = {f.name: norm_type(f.type) for f in s_schema}
    d_map = {f.name: norm_type(f.type) for f in d_schema}
    bad = []
    for c in sorted(set(s_map) | set(d_map)):
        st, dt = s_map.get(c), d_map.get(c)
        if st != dt:
            bad.append(f"{c}: spark={st} duck={dt}")
    return bad

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(("" if x is None else str(x)) for x in t))
    return [cols[i] for i in order], out

def main():
    argv = list(sys.argv[1:])
    strict = "--strict" in argv
    if strict:
        argv.remove("--strict")
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
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
            d_arrow = res.fetch_arrow_table()
            d_cols = list(d_arrow.column_names)
            d_rows = [tuple(r[c] for c in d_cols) for r in d_arrow.to_pylist()]
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
        if strict:
            bad = type_check(name, tbl.schema, d_arrow.schema)
            if bad:
                print(f"FAIL {name}: type mismatch: {'; '.join(bad)}")
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
