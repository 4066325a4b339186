"""Louvain community detection — single-level, like the reference.

Reference (``algo/.../impl/louvain/Louvain.java:77-170``): no graph
coarsening — one level of modularity-greedy moves.  Init: each node its
own community; ``sTot[c]`` = Σ degrees in c; per move candidate
``modGain(v,c) = w_into_c/2m − deg(v)·sTot[c]/(2m)²``
(``Louvain.java:124-126``); best neighbor community with gain ≥ 0 wins
(``:128-141``); iterate until an iteration moves nothing or
``maxIterations``.  ``WeightedLouvain`` sums edge weights instead of
counts.  The reference is semi-asynchronous (shared arrays, ``>=``
tie-keeps-last) — nondeterministic; we run a synchronous variant with
deterministic tie-break (highest gain, then smallest community id) and
**hash-alternating move eligibility** (a deterministic pseudo-random
half of the vertices moves per superstep) to break the swap
oscillations synchronous updates are prone to; convergence is declared
only at a true fixpoint (no vertex has a positive-gain move left).
The reference's own fixtures converge to the same communities.

Spark shape per superstep: sTot = comm ⋈ degrees groupBy(comm);
w_into = edges ⋈ comm(dst side) groupBy(src, target_comm); gain is a
projection; argmax via ``max_by(struct)``.  Two shuffles per superstep,
both map-side combined.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCache, truncate_lineage


@dataclass
class LouvainResult:
    communities: DataFrame         # (id long, community long)
    iterations_ran: int
    did_converge: bool
    community_count: int | None = None
    metrics: list[dict] = field(default_factory=list)


def louvain(
    graph: Graph,
    max_iterations: int = 10,
    weighted: bool = False,
    compute_community_count: bool = False,
) -> LouvainResult:
    """``graph`` is used as-is — pass an undirected (both-direction)
    graph for reference semantics (its loader uses
    ``withDirection(BOTH).asUndirected(true)``, ``LouvainTest.java:122-128``)."""
    spark = graph.spark
    edges = graph.edges.persist()
    wcol = F.col("weight") if weighted else F.lit(1.0)
    deg = edges.groupBy(F.col("src").alias("id")).agg(
        (F.sum("weight") if weighted else F.count(F.lit(1)).cast("double")).alias("deg")
    )
    vertices = graph.vertices.select("id").join(deg, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0.0)).alias("deg")
    ).persist()
    m2 = vertices.agg(F.sum("deg")).first()[0] or 0.0  # 2m
    if m2 == 0.0:
        comm = vertices.select("id", F.col("id").alias("community"))
        return LouvainResult(comm, 0, True, None, [])
    mq2 = m2 * m2

    cache = SuperstepCache(spark)
    comm = truncate_lineage(vertices.select("id", F.col("id").alias("community")))
    cache.track(comm)
    metrics: list[dict] = []
    did_converge = False
    it = 0
    while it < max_iterations:
        it += 1
        t0 = time.time()
        stot = (
            comm.join(vertices, "id")
            .groupBy("community")
            .agg(F.sum("deg").alias("stot"))
        )
        # w_into_c per (node, neighbor community)
        w_into = (
            edges.join(
                comm.select(
                    F.col("id").alias("dst"), F.col("community").alias("tc")
                ).hint("SHUFFLE_HASH"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), F.col("tc"))
            .agg((F.sum(wcol) if weighted else F.count(F.lit(1)).cast("double")).alias("w_in"))
        )
        cand = (
            w_into.join(vertices, "id")
            .join(stot.withColumnRenamed("community", "tc"), "tc")
            .select(
                "id",
                "tc",
                (
                    F.col("w_in") / F.lit(m2)
                    - F.col("deg") * F.col("stot") / F.lit(mq2)
                ).alias("gain"),
            )
            .filter(F.col("gain") >= 0.0)
        )
        best = cand.groupBy("id").agg(
            F.max(F.struct(F.col("gain"), (-F.col("tc")).alias("neg"))).alias("win")
        ).select("id", (-F.col("win.neg")).alias("best_comm"))
        # hash-based eligibility: roughly half the vertices move per
        # superstep, breaking synchronous swap cycles the way the
        # reference's async scheduling does — but reproducibly.  The
        # hash is md5-hex parity of "id:iteration" (portable: DuckDB
        # computes the identical predicate, so the driver oracle can
        # replay the exact move schedule).
        eligible = F.substring(
            F.md5(F.concat_ws(":", F.col("id").cast("string"), F.lit(str(it)))), 1, 1
        ).isin("0", "2", "4", "6", "8", "a", "c", "e")
        wants = best["best_comm"].isNotNull() & (best["best_comm"] != F.col("community"))
        moved = (
            comm.join(best.hint("SHUFFLE_HASH"), "id", "left")
            .select(
                "id",
                F.when(wants & eligible, F.col("best_comm"))
                .otherwise(F.col("community"))
                .alias("community"),
                (wants & eligible).alias("changed"),
                wants.alias("wants"),
            )
        )
        moved = truncate_lineage(moved, eager=False)
        stats = moved.agg(
            F.sum(F.when(F.col("changed"), 1).otherwise(0)).alias("moved"),
            F.sum(F.when(F.col("wants"), 1).otherwise(0)).alias("wants"),
        ).first()
        changed, want_move = int(stats["moved"] or 0), int(stats["wants"] or 0)
        cache.track(moved)  # retire the previous iteration's cached communities
        metrics.append(
            {
                "algorithm": "louvain",
                "iteration": it,
                "moved": changed,
                "want_move": want_move,
                "wall_ms": int(1000 * (time.time() - t0)),
            }
        )
        comm = moved.select("id", "community")
        if want_move == 0:
            # true fixpoint: no vertex has a positive-gain move left
            did_converge = True
            break

    edges.unpersist()
    vertices.unpersist()
    count = None
    if compute_community_count:
        count = comm.select("community").distinct().count()
    return LouvainResult(
        communities=comm,
        iterations_ran=it,
        did_converge=did_converge,
        community_count=count,
        metrics=metrics,
    )
