#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir parquet files registered as views, and compares results as
column-name-sorted multisets of rows.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            s_cols, s_rows = spark_rel.columns, spark_rel.fetchall()
            duck_rel = con.sql(sql)
            d_cols, d_rows = duck_rel.columns, duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failed.append(name)
            continue
        if sorted(map(str.lower, s_cols)) != sorted(map(str.lower, d_cols)):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} "
                  f"duck={sorted(d_cols)}")
            failed.append(name)
            continue
        sr, dr = rowset(s_cols, s_rows), rowset(d_cols, d_rows)
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            failed.append(name)
        elif sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"FAIL {name}: {len(sr)} rows, value mismatch at {diff}")
            for i in diff[:1]:
                print(f"  spark: {sr[i]}\n  duck : {dr[i]}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(sr)} rows")
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
