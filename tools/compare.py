#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each test table from sfDir, runs every oracle_sql.json query,
loads the corresponding Spark parquet output, sorts columns by name and
rows by all columns, and diffs values (exact; floats must already be
rounded identically on both sides).

TYPE-AWARE (round 12): the driver hashes TYPED Arrow values, so a
value-equal but type-unequal column (e.g. DuckDB sum(BIGINT) -> HUGEINT
-> decimal128(38,0) vs Spark int64) is a driver hash mismatch even when
every Python value compares equal. This compare therefore also diffs
the Arrow schema of the oracle result against the Arrow schema of the
Spark parquet, per column, and FAILs on any type divergence. This is
the check that would have caught d26_dup_inflation before it shipped.
"""
import json
import math
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return [c for c in sorted(cols)], sorted(out, key=lambda t: tuple(str(x) for x in t))


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def norm_type(t):
    """Arrow type -> comparable string; fold benign physical aliases.

    large_string/string and large_binary/binary hash identically in the
    driver's value hash; timestamp unit/precision differences and
    int-width/decimal differences do NOT, so those stay distinct.
    """
    s = str(t)
    if s == "large_string":
        return "string"
    if s == "large_binary":
        return "binary"
    s = (s.replace("large_list<", "list<")
         .replace("large_string", "string")
         .replace("large_binary", "binary"))
    return s


def type_diff(want_schema, got_schema):
    """Per-column Arrow type diff on the name-sorted column set."""
    w = {f.name: norm_type(f.type) for f in want_schema}
    g = {f.name: norm_type(f.type) for f in got_schema}
    bad = []
    for name in sorted(set(w) & set(g)):
        if w[name] != g[name]:
            bad.append(f"{name}: oracle={w[name]} spark={g[name]}")
    return bad


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want_tbl = con.execute(sql).arrow()
            want_cols = want_tbl.schema.names
            want_rows = [tuple(r.values()) for r in want_tbl.to_pylist()]
            got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
            got_schema = pq.ParquetDataset(f"{out_dir}/{name}").schema
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:300]}")
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={sorted(want_cols)} got={sorted(got_cols)}")
            continue
        tbad = type_diff(want_tbl.schema, got_schema)
        if tbad:
            print(f"FAIL {name}: TYPE mismatch (driver typed-hash would differ): " + "; ".join(tbad))
            continue
        wc, wr = canon(want_rows, want_cols)
        gc, gr = canon(got_rows, got_cols)
        if len(wr) != len(gr):
            print(f"FAIL {name}: rowcount want={len(wr)} got={len(gr)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(wr, gr)):
            if len(a) != len(b) or not all(eq(x, y) for x, y in zip(a, b)):
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  want={bad[1]}\n  got ={bad[2]}")
            continue
        print(f"OK   {name} ({len(wr)} rows)")
        n_ok += 1
    print(f"== {n_ok}/{len(oracle)} green ==")
    return 0 if n_ok == len(oracle) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
