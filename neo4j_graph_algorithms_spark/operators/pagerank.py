"""PageRank — delta-push power iteration as a superstep DataFrame loop.

Reference semantics (``algo/src/main/java/org/neo4j/graphalgo/impl/
PageRank.java``, proc ``PageRankProc.java:52-56``):

- non-normalized Google formula ``PR(v) = (1-d) + d·Σ PR(u)/outdeg(u)``
  over in-neighbors u (``doc/pagerank.adoc:16-18``);
- init ``rank = delta = 1-d`` (``PageRank.java:416,444-453``);
- each iteration every node with ``delta>0`` pushes ``delta/outdeg`` to
  its out-neighbors (``PageRank.java:455-481``); the received sum is
  scaled by d and added: ``rank += d·Σ; delta = d·Σ``
  (``PageRank.java:505-517``);
- **dangling nodes do not redistribute mass and nothing is normalized**
  (guarded by ``tests/.../impl/PageRankWikiTest.java:131-141``);
- fixed iteration count by default (no convergence test in the
  reference, ``PageRank.java:159-164``); we additionally support
  ``tolerance`` for the north rule's "supersteps to 1e-6 convergence".
- the reference quantizes messages to ``int(100_000·x)``
  (``PageRank.java:54,464``) as a lock-free-accumulation trick; shuffle
  aggregation makes that unnecessary — we keep float64, which *improves*
  on reference precision while staying inside its test tolerances.

Spark shape per superstep (SURVEY.md §2.2):

    msgs  = edges ⋈ frontier(src)  →  groupBy(dst).sum(delta/outdeg)
    state = state ⟕ msgs           →  rank += d·msg ; delta = d·msg

Scale notes (the part that must survive 10^12 edges):

- the scatter join shuffles on ``src``; AQE skew-join splitting handles
  hub sources, and when the active frontier shrinks below
  ``broadcast_frontier_rows`` we broadcast it instead (north rule's
  "broadcast of high-degree frontier") — late supersteps then do **no
  shuffle at all** on the edge side;
- the gather is a ``groupBy(dst).sum`` — Spark's partial (map-side)
  aggregation already combines hub in-neighbors before the shuffle, so
  the reduce side sees one partial per map partition, not one row per
  edge: hub in-degree skew is absorbed without manual salting;
- lineage is cut every superstep (localCheckpoint) or durably through a
  ``SuperstepCheckpointer`` (resume + metrics).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCheckpointer, skew_ratio, truncate_lineage


@dataclass
class PageRankResult:
    scores: DataFrame              # (id long, score double)
    iterations_ran: int
    converged: bool
    metrics: list[dict] = field(default_factory=list)


def pagerank(
    graph: Graph,
    damping: float = 0.85,
    max_iterations: int = 20,
    tolerance: float | None = None,
    checkpointer: SuperstepCheckpointer | None = None,
    checkpoint_interval: int = 1,
    broadcast_frontier_rows: int = 2_000_000,
    collect_skew_metric: bool = False,
) -> PageRankResult:
    """Run PageRank; defaults mirror ``PageRankProc.java:52-56``
    (damping 0.85, 20 iterations, unweighted, OUTGOING edges)."""
    spark = graph.spark
    d = float(damping)
    alpha = 1.0 - d

    # (src, dst, src outdegree) — weight is ignored (reference PageRank
    # loads withoutRelationshipWeights, PageRankProc.java:147).
    out_deg = graph.edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = graph.edges.select("src", "dst").join(out_deg, "src")
    edges = edges.select("src", "dst", "outdeg").persist()
    edges.count()  # materialize once; reused every superstep

    metrics: list[dict] = []
    start_iter = 0
    state = None
    if checkpointer is not None:
        last = checkpointer.latest_iteration()
        if last is not None:
            state = checkpointer.load(last, ["state"])["state"]
            start_iter = last
            metrics = checkpointer.metrics()

    if state is None:
        state = graph.vertices.select(
            F.col("id"),
            F.lit(alpha).alias("rank"),
            F.lit(alpha).alias("delta"),
        )
        state = truncate_lineage(state.repartition("id"))

    converged = False
    it = start_iter
    active_rows = None  # unknown until first aggregate
    while it < max_iterations:
        it += 1
        t0 = time.time()
        frontier = state.filter(F.col("delta") != 0.0).select(
            F.col("id").alias("src"), F.col("delta")
        )
        if active_rows is not None and active_rows <= broadcast_frontier_rows:
            frontier = F.broadcast(frontier)
        msgs = (
            edges.join(frontier, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("delta") / F.col("outdeg")).alias("msg"))
        )
        new_state = (
            state.join(msgs, state["id"] == msgs["dst"], "left")
            .select(
                state["id"],
                (state["rank"] + F.lit(d) * F.coalesce(msgs["msg"], F.lit(0.0))).alias("rank"),
                (F.lit(d) * F.coalesce(msgs["msg"], F.lit(0.0))).alias("delta"),
            )
        )
        iter_metrics: dict = {"algorithm": "pagerank"}
        if checkpointer is not None and it % checkpoint_interval == 0:
            stats = new_state.agg(
                F.max(F.abs(F.col("delta"))).alias("max_delta"),
                F.sum(F.abs(F.col("delta"))).alias("l1_delta"),
                F.sum(F.when(F.col("delta") != 0.0, 1).otherwise(0)).alias("active"),
            ).first()
            iter_metrics.update(
                max_delta=float(stats["max_delta"] or 0.0),
                l1_delta=float(stats["l1_delta"] or 0.0),
                active_vertices=int(stats["active"] or 0),
                wall_ms=int(1000 * (time.time() - t0)),
            )
            if collect_skew_metric:
                iter_metrics["skew_ratio"] = skew_ratio(
                    edges.join(frontier.select("src"), "src"), "dst"
                )
            new_state = checkpointer.save(it, {"state": new_state}, iter_metrics)["state"]
        else:
            new_state = truncate_lineage(new_state)
            stats = new_state.agg(
                F.max(F.abs(F.col("delta"))).alias("max_delta"),
                F.sum(F.when(F.col("delta") != 0.0, 1).otherwise(0)).alias("active"),
            ).first()
            iter_metrics.update(
                max_delta=float(stats["max_delta"] or 0.0),
                active_vertices=int(stats["active"] or 0),
                wall_ms=int(1000 * (time.time() - t0)),
            )
        metrics.append(iter_metrics)
        active_rows = iter_metrics.get("active_vertices")
        state = new_state
        if tolerance is not None and iter_metrics["max_delta"] < tolerance:
            converged = True
            break
        if active_rows == 0:
            converged = True
            break

    edges.unpersist()
    scores = state.select(F.col("id"), F.col("rank").alias("score"))
    return PageRankResult(scores=scores, iterations_ran=it, converged=converged, metrics=metrics)
