"""Shortest paths — frontier-relaxation DataFrame loops.

Reference surface:
- ``algo.shortestPaths[.stream]`` — SSSP Dijkstra to all nodes
  (``impl/ShortestPaths.java:21-60``);
- ``algo.shortestPath.deltaStepping`` — parallel delta-stepping
  (``impl/ShortestPathDeltaStepping.java:20-66``);
- ``algo.shortestPath`` — point-to-point Dijkstra
  (``impl/ShortestPathDijkstra.java:21-60``).

A distributed engine relaxes in bulk rather than popping a priority
queue: per superstep

    relax = edges ⋈ frontier(src) → groupBy(dst).min(dist + w)
    improved = relax < dist       → next frontier

i.e. frontier Bellman-Ford.  ``delta`` bucketing (delta-stepping's
priority) maps to restricting each superstep's frontier to the lowest
open distance bucket — fewer wasted relaxations on weighted graphs at
the cost of more supersteps; with ``delta=None`` every improved vertex
re-relaxes (plain Bellman-Ford, best for small-diameter graphs).

Results match Dijkstra exactly on non-negative weights (both are exact
SSSP); unreachable vertices get infinity, as in the reference
(``ShortestPaths.java`` initializes Double.POSITIVE_INFINITY).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCache, truncate_lineage


@dataclass
class SsspResult:
    distances: DataFrame           # (id long, distance double)
    iterations_ran: int
    metrics: list[dict] = field(default_factory=list)


def shortest_paths(
    graph: Graph,
    start_node: int,
    delta: float | None = None,
    max_iterations: int = 10_000,
) -> SsspResult:
    """SSSP from ``start_node`` over non-negative edge weights."""
    inf = float("inf")
    edges = graph.edges.persist()

    dist = graph.vertices.select(
        "id",
        F.when(F.col("id") == start_node, 0.0).otherwise(F.lit(inf)).alias("distance"),
    )
    dist = truncate_lineage(dist.repartition("id"))  # eager
    frontier = dist.filter(F.col("distance") < inf).select(
        F.col("id").alias("src"), F.col("distance").alias("d")
    )
    cache = SuperstepCache(graph.spark)
    cache.track(dist)
    metrics: list[dict] = []
    it = 0
    while it < max_iterations:
        it += 1
        t0 = time.time()
        f = frontier
        deferred = None
        if delta is not None:
            # delta-stepping: relax only the lowest open bucket; rows in
            # higher buckets are *deferred*, not dropped — they rejoin the
            # frontier next superstep (possibly with an improved distance,
            # resolved by the min-merge below).
            min_open = f.agg(F.min("d")).first()[0]
            if min_open is None:
                break
            bucket_end = (int(min_open / delta) + 1) * delta
            deferred = f.filter(F.col("d") >= F.lit(bucket_end))
            f = f.filter(F.col("d") < F.lit(bucket_end))
        relax = (
            edges.join(f, "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min(F.col("d") + F.col("weight")).alias("nd"))
        )
        joined = dist.join(relax, "id", "left").select(
            "id",
            F.least(F.col("distance"), F.coalesce(F.col("nd"), F.col("distance"))).alias(
                "distance"
            ),
            (F.coalesce(F.col("nd"), F.col("distance")) < F.col("distance")).alias(
                "improved"
            ),
        )
        joined = truncate_lineage(joined, eager=False)
        improved = joined.filter(F.col("improved")).count()
        metrics.append(
            {
                "algorithm": "sssp",
                "iteration": it,
                "improved": int(improved),
                "wall_ms": int(1000 * (time.time() - t0)),
            }
        )
        dist = joined.select("id", "distance")
        frontier = joined.filter(F.col("improved")).select(
            F.col("id").alias("src"), F.col("distance").alias("d")
        )
        if deferred is not None:
            # min-merge: a deferred row whose distance improved this round
            # appears in both branches; keep the smaller distance.
            frontier = (
                frontier.unionByName(deferred)
                .groupBy("src")
                .agg(F.min("d").alias("d"))
            )
            frontier = truncate_lineage(frontier)  # eager
            # retire the previous iteration's state AND frontier only
            # after BOTH of this iteration's checkpoints are live
            cache.track(joined, frontier)
            if improved == 0 and frontier.isEmpty():
                break
        else:
            cache.track(joined)
            if improved == 0:
                break

    edges.unpersist()
    return SsspResult(distances=dist, iterations_ran=it, metrics=metrics)


def shortest_path(
    graph: Graph, start_node: int, end_node: int, delta: float | None = None
) -> float:
    """Point-to-point distance (``algo.shortestPath`` without the path
    materialization); infinity when unreachable."""
    res = shortest_paths(graph, start_node, delta=delta)
    row = res.distances.filter(F.col("id") == end_node).first()
    return float(row["distance"]) if row is not None else float("inf")
