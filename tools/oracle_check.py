#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir>

For each query result parquet under <verify_out_dir>, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = <sf_dir>/*.parquet
registered as views) and compares: row count, column names (sorted),
and cell values (exact, after sorting columns by name).  This is a
builder-side dev tool only — the engine itself never uses DuckDB.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    # let heavy oracles (sf1-scale audits) spill instead of OOM-ing;
    # an in-memory duckdb has NO temp dir by default
    con.execute("SET temp_directory='/tmp/graft_oracle_spill'")
    for t in TABLES:
        # driver testdata ships single files; GenScale's sf1 tier is a
        # Spark-written DIRECTORY of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: engine result unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"vs oracle {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got.at[i, c], want.at[i, c]):
                    bad = (i, c, got.at[i, c], want.at[i, c])
                    break
            if bad:
                break
        if bad:
            i, c, g, w = bad
            print(f"FAIL {name}: first diff row {i} col {c}: "
                  f"engine={g!r} oracle={w!r}")
            n_fail += 1
        else:
            print(f"pass {name} ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
