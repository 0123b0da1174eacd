#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir> [name ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sfDir parquet files registered as views, and compares results the way the
driver does: convert both to pandas, sort columns by name, sort rows with
DataFrame.sort_values (this is what chokes on array cells), then compare
canonicalized values (floats via repr — so a DuckDB HUGEINT that pandas
widens to float64 will NOT match an int64, reproducing CORRECTNESS_r01's
hash mismatches).
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


def frame(rel):
    df = rel.df()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL unknown query names (not in oracle_sql.json): {sorted(unknown)}")
        sys.exit(1)
    failed = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            s_df = frame(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
            d_df = frame(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            failed.append(name)
            continue
        if list(map(str.lower, s_df.columns)) != list(map(str.lower, d_df.columns)):
            print(f"FAIL {name}: columns spark={list(s_df.columns)} "
                  f"duck={list(d_df.columns)}")
            failed.append(name)
            continue
        if len(s_df) != len(d_df):
            print(f"FAIL {name}: rows spark={len(s_df)} duck={len(d_df)}")
            failed.append(name)
            continue
        sr = [tuple(canon(v) for v in row) for row in s_df.itertuples(index=False)]
        dr = [tuple(canon(v) for v in row) for row in d_df.itertuples(index=False)]
        # row order under sort_values can differ across engines for ties;
        # compare as sorted multisets like the driver's hash does
        sr.sort()
        dr.sort()
        if sr != dr:
            diff = [i for i, (a, b) in enumerate(zip(sr, dr)) if a != b][:3]
            print(f"FAIL {name}: {len(sr)} rows, value mismatch at {diff}")
            for i in diff[:1]:
                print(f"  spark: {sr[i]}\n  duck : {dr[i]}")
            failed.append(name)
        else:
            print(f"OK   {name}: {len(sr)} rows")
    n = len(only) if only else len(oracle)
    print(f"\n{n - len(failed)}/{n} queries match")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
