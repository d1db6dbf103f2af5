#!/usr/bin/env python3
"""Local oracle checker mimicking the driver's DuckDB compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]

Loads each <verifyOutDir>/<name> parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the sf-dir parquet
registered under bare table names, sorts columns by name and rows by value,
and diffs.
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows), \
        [cols[i] for i in order]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # Cap memory and give DuckDB a spill directory so a heavy oracle spills
    # instead of dying with an allocation failure under co-tenant pressure
    # (the r3 q38 OOM). Both env-overridable for stress runs.
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '8GB')}'")
    tmp = os.environ.get("ORACLE_TMP", "/tmp/graft_duckdb_spill")
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"SET temp_directory='{tmp}'")
    if os.environ.get("ORACLE_THREADS"):
        con.execute(f"SET threads={int(os.environ['ORACLE_THREADS'])}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            sp = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            sp_rows, sp_cols0 = sp.fetchall(), [d[0] for d in sp.description]
            du = con.execute(sql)
            du_rows, du_cols0 = du.fetchall(), [d[0] for d in du.description]
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        a, ac = rows_to_set(sp_cols0, sp_rows)
        b, bc = rows_to_set(du_cols0, du_rows)
        if ac != bc:
            print(f"FAIL {name}: columns differ spark={ac} duck={bc}")
            n_fail += 1
        elif a != b:
            sa, sb = set(a), set(b)
            extra = [r for r in a if r not in sb][:3]
            missing = [r for r in b if r not in sa][:3]
            print(f"FAIL {name}: rows spark={len(a)} duck={len(b)} "
                  f"spark-only={extra} duck-only={missing}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(a)} rows")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
