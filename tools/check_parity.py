"""Replicates the driver's correctness gate: run each __spark_entry__
query and its DuckDB oracle side-by-side, compare row count, schema,
and order-insensitive values (exact, after the queries' own rounding).

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=repr)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from neo4j_graph_algorithms_spark.session import get_spark

    spark = get_spark(app_name="parity", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"rows-only  {name}: {len(srows)} rows  ({t1 - t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle error: {e}")
            continue
        t2 = time.time()
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        status = "ok"
        if sc != oc:
            status = f"SCHEMA MISMATCH spark={sc} oracle={oc}"
        elif len(sr) != len(orr):
            status = f"ROWCOUNT MISMATCH spark={len(sr)} oracle={len(orr)}"
        elif sr != orr:
            bad = sum(1 for a, b in zip(sr, orr) if a != b)
            ex = next((a, b) for a, b in zip(sr, orr) if a != b)
            status = f"VALUE MISMATCH {bad}/{len(sr)} rows, e.g. spark={ex[0]} oracle={ex[1]}"
        if status != "ok":
            failures.append(name)
            print(f"FAIL  {name}: {status}  (spark {t1-t0:.1f}s, duck {t2-t1:.1f}s)")
        else:
            print(f"ok    {name}: {len(sr)} rows match  (spark {t1-t0:.1f}s, duck {t2-t1:.1f}s)")

    print("\n%d failures" % len(failures), failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
