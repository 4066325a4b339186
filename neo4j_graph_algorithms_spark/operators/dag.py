"""DAG scheduling primitives — topological levels / longest path.

GDS-era surface (``gds.dag.topologicalSort`` / ``gds.dag.longestPath``):
for a directed *acyclic* graph, assign every vertex its **level** = the
length of the longest directed path ending at it.  Sorting by
``(level, id)`` is a valid topological order (every edge goes from a
lower level to a strictly higher one), and the per-vertex level is the
critical-path distance used by build/task schedulers.

Spark shape: monotone max-propagation fixpoint — the same
frontier-superstep plan as WCC's min-label loop with ``max(level)+1``
as the gather.  Only vertices whose level changed re-send (the
frontier shrinks to the vertices on still-growing paths), one
SHUFFLE_HASH scatter + map-side-combined gather per superstep, state
lineage-cut and superstep-cache-retired every round.  Supersteps =
longest-path length; on the deep-chain worst case that is O(n), which
is inherent to longest-path semantics (it is NOT reducible by
pointer-doubling without materializing quadratic path state) — run
:func:`neo4j_graph_algorithms_spark.operators.scc` first when
cyclicity is unknown, and bound the depth with ``max_iterations``.

Cycle handling: on a cyclic input the recurrence has no fixpoint
(levels grow forever); the loop raises once ``max_iterations`` is
exceeded rather than returning wrong levels.  A true cycle *witness*
is SCC's job (``algo.scc``); this operator's contract mirrors the
reference's procs, which assume the projection matches the algorithm.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..graph import derived_vertices as _verts
from ..plans.checkpoint import (
    SuperstepCache,
    SuperstepCheckpointer,
    aqe_suspended,
    truncate_lineage,
)


@dataclass
class TopoResult:
    levels: DataFrame              # (id long, level long)
    iterations_ran: int
    max_level: int | None = None
    metrics: list[dict] = field(default_factory=list)
    load_millis: int = 0
    compute_millis: int = 0


def topological_levels(
    graph: Graph,
    max_iterations: int = 1000,
    checkpointer: SuperstepCheckpointer | None = None,
) -> TopoResult:
    """``(id, level)`` with level = longest directed path length ending
    at the vertex (sources = 0).  Raises ``ValueError`` if the levels
    have not stabilized after ``max_iterations`` supersteps — a cycle,
    or a path deeper than the bound."""
    spark = graph.spark
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    t_load0 = time.time()
    with aqe_suspended(spark):
        base = graph.edges.select("src", "dst").persist()
        base.count()  # ONE evaluation of the user's edge subtree
        edges = (
            base
            .filter(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
            .repartition(n_part, "src")
            .persist()
        )
        edges.count()

        state = _verts(graph, base).select("id", F.lit(0).cast("long").alias("level"))
        metrics: list[dict] = []
        start_iter = 0
        if checkpointer is not None:
            last = checkpointer.latest_iteration()
            if last is not None:
                state = checkpointer.load(last, ["state"])["state"]
                start_iter = last
                metrics = checkpointer.metrics()
        cache = SuperstepCache(spark)
        state = truncate_lineage(state.repartition(n_part, "id"))
        base.unpersist()  # message table persisted, state checkpointed
        cache.track(state)
        frontier = state.select(F.col("id").alias("src"), "level")
        load_millis = int(1000 * (time.time() - t_load0))
        t_compute0 = time.time()

        it = start_iter
        converged = False
        while it < max_iterations:
            it += 1
            t0 = time.time()
            cand = (
                edges.join(frontier.hint("SHUFFLE_HASH"), "src")
                .groupBy(F.col("dst").alias("id"))
                .agg((F.max("level") + F.lit(1)).alias("cand"))
            )
            joined = state.join(cand.hint("SHUFFLE_HASH"), "id", "left").select(
                "id",
                F.greatest(F.col("level"), F.coalesce("cand", F.col("level"))).alias("level"),
                (F.coalesce("cand", F.col("level")) > F.col("level")).alias("changed"),
            )
            if checkpointer is not None:
                joined = checkpointer.save(
                    it, {"state": joined}, {"algorithm": "topological_levels"}
                )["state"]
            else:
                joined = truncate_lineage(joined, eager=False)
            changed = joined.filter(F.col("changed")).count()
            cache.track(joined)
            state = joined.select("id", "level")
            metrics.append(
                {
                    "algorithm": "topological_levels",
                    "iteration": it,
                    "changed_vertices": int(changed),
                    "wall_ms": int(1000 * (time.time() - t0)),
                }
            )
            if changed == 0:
                converged = True
                break
            frontier = joined.filter(F.col("changed")).select(
                F.col("id").alias("src"), "level"
            )

        edges.unpersist()
        if not converged:
            raise ValueError(
                f"topological_levels did not stabilize after {max_iterations} "
                "supersteps: the graph has a cycle, or a directed path deeper "
                "than max_iterations (run algo.scc to locate cycles)"
            )
        mx = state.agg(F.max("level")).collect()[0][0]
    return TopoResult(
        levels=state,
        iterations_ran=it,
        max_level=int(mx) if mx is not None else None,
        metrics=metrics,
        load_millis=load_millis,
        compute_millis=int(1000 * (time.time() - t_compute0)),
    )
