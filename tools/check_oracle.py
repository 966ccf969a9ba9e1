#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>.parquet file (written by graft.Verify) and the
oracle_sql.json dump, runs each oracle in DuckDB over the same testdata
parquet tables, sorts columns by name, and compares values exactly.
Dev-only tooling (driver-side python libs); not part of the Scala library.
"""
import sys, json, os, math, decimal, datetime

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, datetime.datetime):
        return ("ts", v.isoformat())
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, list):
        return ("l", tuple(canon(x) for x in v))
    return ("o", repr(v))


def rows_of_table(tbl):
    cols = sorted(tbl.column_names)
    data = [tbl.column(c).to_pylist() for c in cols]
    return cols, [tuple(canon(v) for v in row) for row in zip(*data)] if data else (cols, [])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        f = f"{out_dir}/{name}.parquet"
        if not os.path.exists(f):
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_tbl = pq.read_table(f)
        try:
            duck_tbl = con.execute(oracle[name]).arrow()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, srows = rows_of_table(spark_tbl)
        dcols, drows = rows_of_table(duck_tbl)
        if [c.lower() for c in scols] != [c.lower() for c in dcols]:
            print(f"FAIL {name}: columns differ spark={scols} duck={dcols}")
            n_fail += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount spark={len(srows)} duck={len(drows)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first at {i}:")
            print(f"  cols : {scols}")
            print(f"  spark: {a}")
            print(f"  duck : {b}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
