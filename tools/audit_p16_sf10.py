#!/usr/bin/env python3
"""sf10 audit of p16's connected-components step, DuckDB-free.

p16_dedup_clusters' full DuckDB oracle (the p02 minhash CTEs + a
recursive transitive-closure CTE) is infrastructure-bound at sf10 in
this container: the recursion's spill exceeded the ~78 GB free disk
(`IO Error: Could not write file .../duckdb_temp_storage-*.tmp`).
p16 IS oracle-green at sf1 (committed CORRECTNESS_SELF_sf1.json), and
its candidate/verify stage is exactly p02's, which PASSES the DuckDB
oracle at sf10 — so the one unaudited step at sf10 is the CC itself.

This script closes that gap independently of DuckDB's recursion:
union-find over the DuckDB-VERIFIED p02 pair set, compared row-for-row
against Spark's p16 output (cluster_id = least reachable doc_id,
keep = 1 iff doc_id == cluster_id, membership = docs appearing in any
pair). Exact-match or loud failure.

Usage: audit_p16_sf10.py [verify_out_dir]   (default /tmp/v_sf10 —
run a subset Verify with p02_minhash_lsh,p16_dedup_clusters first,
and oracle_check must have PASSED p02 for the pair set to count as
verified.)
"""
import sys

import duckdb


def find(parent: dict, x: int) -> int:
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:
        parent[x], x = r, parent[x]
    return r


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/v_sf10"
    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT d1, d2 FROM read_parquet('{out}/p02_minhash_lsh/*.parquet')"
    ).fetchall()
    p16 = con.execute(
        "SELECT doc_id, cluster_id, keep FROM "
        f"read_parquet('{out}/p16_dedup_clusters/*.parquet')").fetchall()
    parent: dict = {}
    nodes = set()
    for d1, d2 in pairs:
        nodes.add(d1)
        nodes.add(d2)
        ra, rb = find(parent, d1), find(parent, d2)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {n: find(parent, n) for n in nodes}
    got = {r[0]: (r[1], r[2]) for r in p16}
    if set(got) != nodes:
        raise SystemExit(
            f"membership differs: {len(set(got) ^ nodes)} docs")
    bad = [n for n in nodes
           if got[n][0] != expect[n]
           or got[n][1] != (1 if n == expect[n] else 0)]
    print(f"pairs={len(pairs)} p16_rows={len(p16)} mismatches={len(bad)}")
    if bad:
        raise SystemExit(f"MISMATCH, first ids: {sorted(bad)[:5]}")
    print("OK: p16 CC == union-find over the oracle-verified p02 pair set")


if __name__ == "__main__":
    main()
