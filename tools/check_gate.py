"""Local stand-in for the driver's correctness gate.

Runs every queries() entry on Spark at the given sf dir, runs the matching
oracle_sql() in DuckDB with the tables registered as views, and compares
row count, column names, and order-insensitive values.

Usage: python tools/check_gate.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracles that embed data-derived literals (ivf centroids) read this
    os.environ["SPARK_GRAFT_ORACLE_SF"] = sf_dir

    import __spark_entry__ as E
    from osmquadtree_rust_spark.session import get_spark

    spark = get_spark("gate-check", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        s_set = sorted(
            tuple(norm(v) for v in row) for row in ([tuple(r) for r in srows])
        )
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as ex:
            failures.append((name, f"oracle error: {ex}"))
            print(f"{name:28s} ORACLE ERROR: {str(ex)[:120]}")
            continue
        o_set = sorted(tuple(norm(v) for v in row) for row in orows)
        ok_cols = [c.lower() for c in scols] == [c.lower() for c in ocols]
        ok_rows = len(s_set) == len(o_set)
        ok_vals = s_set == o_set
        status = "OK" if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(
            f"{name:28s} {status}  spark={len(s_set)} duck={len(o_set)} "
            f"cols={'=' if ok_cols else scols + ocols}  ({time.time()-t0:.1f}s)"
        )
        if status == "FAIL":
            if not ok_vals and ok_rows:
                diffs = [
                    (a, b) for a, b in zip(s_set, o_set) if a != b
                ][:3]
                print("   first diffs:", diffs)
            failures.append((name, "mismatch"))
    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print(f"all {len([n for n in qs if not only or n in only])} queries consistent")


if __name__ == "__main__":
    main()
