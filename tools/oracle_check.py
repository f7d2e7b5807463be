#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: oracle_check.py <verify_out_dir> <sf_dir> [--json <out.json>]

For each query result parquet under <verify_out_dir>, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = <sf_dir>/*.parquet
registered as views) and compares: row count, column names (sorted),
and cell values (exact, after sorting columns by name).  This is a
builder-side dev tool only — the engine itself never uses DuckDB.

--json writes per-query results in the driver's CORRECTNESS_r{N}.json
shape (rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err), so scale-tier audits (e.g. the sf1 run) leave a
COMMITTED artifact instead of a prose claim.  Queries not selected by
a subset (SPARK_GRAFT_ONLY) Verify run appear in the SAME shape with
null fields, err="skipped: ...", and an extra "skipped": true flag —
so a subset artifact is distinguishable from a full audit without any
entry ever missing the rows_match/... keys.
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
    if len(sys.argv) < 3:
        raise SystemExit(__doc__.strip().splitlines()[2])
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    json_out = None
    if "--json" in sys.argv:
        i = sys.argv.index("--json")
        if i + 1 >= len(sys.argv):
            raise SystemExit("--json requires an output path argument")
        json_out = sys.argv[i + 1]
    report = {}

    def record(name, rows_match, schema_match, hash_match,
               spark_rows, oracle_rows, err=None):
        report[name] = {"rows_match": rows_match,
                        "schema_match": schema_match,
                        "hash_match": hash_match,
                        "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows,
                        "err": err}

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    # Verify records per-query engine failures here; a query with no
    # result dir AND no recorded failure was simply not selected
    # (SPARK_GRAFT_ONLY subset run) — skip it instead of mis-reporting
    # "unreadable". A genuinely-failed query still FAILs loudly below.
    verify_errors = {}
    try:
        with open(f"{out_dir}/verify_errors.json") as f:
            verify_errors = json.load(f)
    except FileNotFoundError:
        pass
    # Verify also records the SELECTED query set.  A selected query
    # with neither a result dir nor an error entry means a stale or
    # half-written verify_out — that must FAIL, not read as "not
    # selected".  Older dumps without the file fall back to treating
    # every oracle as selected (the pre-subset loud behavior).
    try:
        with open(f"{out_dir}/selected_queries.json") as f:
            selected = set(json.load(f))
    except FileNotFoundError:
        print("note: no selected_queries.json (old Verify dump) — "
              "treating ALL oracles as selected")
        selected = set(oracles)
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
    n_skip = 0
    for name in sorted(oracles):
        sql = oracles[name]
        if not os.path.exists(f"{out_dir}/{name}"):
            if name in verify_errors:
                print(f"FAIL {name}: engine error: {verify_errors[name]}")
                record(name, False, False, False, None, None,
                       f"engine error: {verify_errors[name]}")
                n_fail += 1
            elif name in selected:
                print(f"FAIL {name}: selected but no result dir and no "
                      "error entry — stale or half-written verify_out?")
                record(name, False, False, False, None, None,
                       "selected but missing: no result dir, no error "
                       "entry (stale/partial verify_out)")
                n_fail += 1
            else:
                n_skip += 1  # not selected in this (subset) Verify run
                # uniform record() shape (nulls + err) so consumers that
                # index rows_match on every entry never KeyError; the
                # extra "skipped" flag marks subset-mode artifacts
                record(name, None, None, None, None, None,
                       "skipped: not selected in this Verify run")
                report[name]["skipped"] = True
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: engine result unreadable: {e}")
            record(name, False, False, False, None, None,
                   f"engine result unreadable: {e}")
            n_fail += 1
            continue
        try:
            want = canon(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            record(name, False, False, False, len(got), None,
                   f"oracle error: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} "
                  f"vs oracle {list(want.columns)}")
            record(name, len(got) == len(want), False, False,
                   len(got), len(want))
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            record(name, False, True, False, len(got), len(want))
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
        record(name, True, True, bad is None, len(got), len(want))
        if bad:
            i, c, g, w = bad
            print(f"FAIL {name}: first diff row {i} col {c}: "
                  f"engine={g!r} oracle={w!r}")
            n_fail += 1
        else:
            print(f"pass {name} ({len(got)} rows)")
            n_pass += 1
    if json_out:
        with open(json_out, "w") as f:
            json.dump(report, f, indent=2)
            f.write("\n")
        print(f"report written to {json_out}")
    skip = f" / {n_skip} not-run (subset)" if n_skip else ""
    print(f"== {n_pass} pass / {n_fail} fail{skip} ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
