#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Registers each test table from sfDir, runs every oracle_sql.json query,
loads the corresponding Spark parquet output, sorts columns by name and
rows by all columns, and diffs values (exact; floats must already be
rounded identically on both sides).
"""
import json
import math
import sys

import duckdb

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


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.execute(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
            got = con.execute(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:300]}")
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols want={sorted(want_cols)} got={sorted(got_cols)}")
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
