"""A/B for the batched weighted-APSP delta bucketing (VERDICT r4 item
6): plain Bellman-Ford vs ``delta=`` bucket discipline on a weighted
high-diameter fixture where BF floods speculative relaxations.

Fixture: ``chains`` parallel weight-1 chains of length ``depth``
stitched to a shared root, PLUS heavy "tempting shortcut" edges from
the root to every 3rd chain vertex with weight (true distance + slack)
— each shortcut wins a round early, floods its subtree with a wrong
distance, and is re-improved later by the cheap chain path.  This is
the delta-stepping textbook case.

Metrics per leg: supersteps, Σ relaxed frontier rows (the work the
bucket discipline is supposed to cut), wall seconds, and a result
hash (must be identical).

Usage: python tools/apsp_delta_ab.py [--chains 64] [--depth 60]
       [--cores 16] [--delta 4.0] [--sources 8]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from neo4j_graph_algorithms_spark import Graph  # noqa: E402
from neo4j_graph_algorithms_spark.operators.sssp import (  # noqa: E402
    all_shortest_paths_weighted,
)
from neo4j_graph_algorithms_spark.session import get_spark  # noqa: E402


def fixture_edges(spark, chains: int, depth: int):
    """Root 0; chain c vertex j has id 1 + c*depth + j."""
    rows = []
    for c in range(chains):
        base = 1 + c * depth
        rows.append((0, base, 1.0))
        for j in range(depth - 1):
            rows.append((base + j, base + j + 1, 1.0))
        for j in range(2, depth, 3):
            # shortcut: right distance would be j+1; offer j+1+6 so the
            # one-hop relaxation wins early and is beaten later
            rows.append((0, base + j, float(j + 7)))
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def run_leg(g, sources, delta):
    t0 = time.time()
    m: list[dict] = []
    out = all_shortest_paths_weighted(g, sources=sources, delta=delta, metrics=m)
    rows = sorted(
        (r["source_node_id"], r["target_node_id"], round(r["distance"], 9))
        for r in out.collect()
    )
    dt = time.time() - t0
    h = hashlib.md5(repr(rows).encode()).hexdigest()[:12]
    return {
        "seconds": round(dt, 2),
        "pairs": len(rows),
        "hash": h,
        "supersteps": len(m),
        "relaxed_rows_total": sum(r["relaxed_rows"] for r in m),
        "improved_total": sum(r["improved"] for r in m),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains", type=int, default=64)
    ap.add_argument("--depth", type=int, default=60)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--delta", type=float, default=4.0)
    ap.add_argument("--sources", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(
        app_name="apsp-delta-ab", cores=args.cores, shuffle_partitions=16
    )
    edges = fixture_edges(spark, args.chains, args.depth).persist()
    edges.count()
    g = Graph.from_edges(edges, weight="weight")
    sources = [0] + [1 + c * args.depth for c in range(args.sources - 1)]

    plain = run_leg(g, sources, None)
    bucket = run_leg(g, sources, args.delta)
    print(json.dumps({"leg": "bellman_ford", **plain}))
    print(json.dumps({"leg": f"delta_{args.delta}", **bucket}))
    print(
        json.dumps(
            {
                "hash_identical": plain["hash"] == bucket["hash"],
                "wall_ratio": round(plain["seconds"] / bucket["seconds"], 3)
                if bucket["seconds"]
                else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
