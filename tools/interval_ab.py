"""Check-cadence A/B for the non-PageRank superstep loops (VERDICT r4
item 5): wcc / labelprop / katz / eigenvector on the 20M-edge north
input at convergence-check intervals {4, 16}, same session, alternated
legs.  PageRank's own 8→16 A/B measured 1.48x on the north leg; this
harness asks whether the other loops inherit that.

Result-compatibility notes (why a faster cadence may still be
rejected as a DEFAULT):
- wcc / labelprop: supersteps past the fixpoint are no-ops (min-label /
  stable-vote idempotence) — results bit-identical at any interval;
  only iterations_ran may overshoot.  Safe to retune.
- katz: the loop ACCUMULATES attenuation terms; checking later runs
  more supersteps, and converged scores then include extra αᵏ terms —
  results change (by < tolerance, but hash-parity breaks).  Interval
  is a caller knob, not retunable behind an exact oracle.
- eigenvector: L2 normalization happens AT check boundaries; moving
  the boundary changes the float trajectory.  Same verdict as katz.

Usage: python tools/interval_ab.py
       [--edges-path /tmp/spark_graft_north_edges_100k.parquet]
       [--cores 32] [--intervals 4,16] [--ops wcc,labelprop,katz,eigenvector]
Prints one JSON line per (op, interval) leg plus a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_graph_algorithms_spark import (  # noqa: E402
    Graph,
    label_propagation,
    wcc,
)
from neo4j_graph_algorithms_spark.operators.eigenvector import (  # noqa: E402
    eigenvector_centrality,
)
from neo4j_graph_algorithms_spark.operators.katz import katz_centrality  # noqa: E402
from neo4j_graph_algorithms_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--edges-path", default="/tmp/spark_graft_north_edges_100k.parquet"
    )
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--intervals", default="4,16")
    ap.add_argument("--ops", default="wcc,labelprop,katz,eigenvector")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    intervals = [int(x) for x in args.intervals.split(",")]
    ops = args.ops.split(",")

    spark = get_spark(
        app_name="interval-ab", cores=args.cores, shuffle_partitions=args.cores
    )
    edges = spark.read.parquet(args.edges_path).persist()
    n_edges = edges.count()

    def legs(op: str, run):
        # warmup once per op (JIT for its agg shape)
        run(intervals[0], warm=True)
        best: dict[int, float] = {}
        iters: dict[int, int] = {}
        for _ in range(args.repeat):
            for iv in intervals:            # alternated, same climate
                t0 = time.time()
                it = run(iv, warm=False)
                dt = time.time() - t0
                iters[iv] = it
                if iv not in best or dt < best[iv]:
                    best[iv] = dt
        for iv in intervals:
            print(
                json.dumps(
                    {
                        "op": op,
                        "interval": iv,
                        "best_seconds": round(best[iv], 2),
                        "iterations": iters[iv],
                        "edges": n_edges,
                    }
                )
            )
        base, alt = intervals[0], intervals[-1]
        print(
            json.dumps(
                {
                    "op": op,
                    "speedup": round(best[base] / best[alt], 3),
                    "from_interval": base,
                    "to_interval": alt,
                }
            )
        )

    if "wcc" in ops:
        def run_wcc(iv, warm):
            g = Graph.from_edges(edges)
            res = wcc(g, max_iterations=4 if warm else 200, check_interval=iv)
            res.components.count()
            return res.iterations_ran

        legs("wcc", run_wcc)

    if "labelprop" in ops:
        def run_lp(iv, warm):
            g = Graph.from_edges(edges)
            res = label_propagation(
                g, max_iterations=4 if warm else 16, aggregate_interval=iv
            )
            res.labels.count()
            return res.iterations_ran

        legs("labelprop", run_lp)

    if "katz" in ops:
        def run_katz(iv, warm):
            g = Graph.from_edges(edges)
            res = katz_centrality(
                g,
                max_iterations=4 if warm else 50,
                tolerance=1e-6,
                check_interval=iv,
            )
            res.scores.count()
            return res.iterations_ran

        legs("katz", run_katz)

    if "eigenvector" in ops:
        def run_eig(iv, warm):
            g = Graph.from_edges(edges)
            res = eigenvector_centrality(
                g,
                max_iterations=4 if warm else 50,
                tolerance=1e-6,
                check_interval=iv,
            )
            res.scores.count()
            return res.iterations_ran

        legs("eigenvector", run_eig)

    spark.stop()


if __name__ == "__main__":
    main()
