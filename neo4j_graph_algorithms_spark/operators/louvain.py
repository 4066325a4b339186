"""Louvain community detection — single-level (reference parity) plus
an opt-in multi-level mode (graph coarsening, GDS-style).

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

``levels > 1`` (beyond-reference): after a level reaches fixpoint,
each community is contracted to a super-node — edge weights are summed
per (community, community) pair, intra-community edges become
self-loops (their weight keeps the node strength and 2m invariant) —
and the same move phase reruns on the contracted weighted graph.  The
reference gain formula needs no modification: ``w_into`` and ``sTot``
are weight sums either way, and the eligibility schedule restarts at
iteration 1 per level, so the whole multi-level run stays exactly
deterministic (and SQL-replayable — see the driver oracle).  Final
community ids bottom out at original vertex ids.

Spark shape per superstep: sTot = comm ⋈ degrees groupBy(comm);
w_into = edges ⋈ comm(dst side) groupBy(src, target_comm); gain is a
projection; argmax via ``max_by(struct)``.  Two shuffles per superstep,
both map-side combined.  Contraction is one groupBy over the edge
table per level — at 100 TB each level's graph shrinks by the average
community size, so the level-2+ passes are much cheaper than level 1.
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
    levels_ran: int = 1


def _one_level(
    spark,
    edges: DataFrame,
    vertices: DataFrame,
    max_iterations: int,
    level: int,
    metrics: list[dict],
    check_interval: int = 1,
) -> tuple[DataFrame, int, bool, int]:
    """One move phase over ``edges (src, dst, weight)`` /
    ``vertices (id)``; returns (communities, iterations, converged,
    total_moved)."""
    edges = edges.persist()
    deg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("deg"))
    verts = vertices.select("id").join(deg, "id", "left").select(
        "id", F.coalesce("deg", F.lit(0.0)).alias("deg")
    ).persist()
    m2 = verts.agg(F.sum("deg")).first()[0] or 0.0  # 2m
    if m2 == 0.0:
        comm = verts.select("id", F.col("id").alias("community"))
        edges.unpersist()
        verts.unpersist()
        return comm, 0, True, 0
    mq2 = m2 * m2

    cache = SuperstepCache(spark)
    comm = truncate_lineage(verts.select("id", F.col("id").alias("community")))
    cache.track(comm)
    did_converge = False
    total_moved = 0
    k_check = max(1, int(check_interval))
    pending: list[DataFrame] = []
    it = 0
    while it < max_iterations:
        it += 1
        t0 = time.time()
        stot = (
            comm.join(verts, "id")
            .groupBy("community")
            .agg(F.sum("deg").alias("stot"))
        )
        # w_into_c per (node, neighbor community); self-loops count
        # toward the own community, mirroring the reference's formula
        w_into = (
            edges.join(
                comm.select(
                    F.col("id").alias("dst"), F.col("community").alias("tc")
                ).hint("SHUFFLE_HASH"),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), F.col("tc"))
            .agg(F.sum("weight").alias("w_in"))
        )
        cand = (
            w_into.join(verts, "id")
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
        # replay the exact move schedule; it restarts per level).
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
        pending.append(moved)
        comm = moved.select("id", "community")
        if it % k_check == 0 or it >= max_iterations:
            # batch boundary: materialize (caching every pending lazy
            # level during this job), adopt the batch, retire the
            # previous one.  Supersteps past the fixpoint are no-ops
            # (nobody wants to move), so checking every k supersteps
            # only delays detection by <k no-op iterations — the
            # unrolled driver oracle is invariant to that by design.
            stats = moved.agg(
                F.sum(F.when(F.col("changed"), 1).otherwise(0)).alias("moved"),
                F.sum(F.when(F.col("wants"), 1).otherwise(0)).alias("wants"),
            ).first()
            changed, want_move = int(stats["moved"] or 0), int(stats["wants"] or 0)
            total_moved += changed
            cache.track(*pending)
            pending = []
            metrics.append(
                {
                    "algorithm": "louvain",
                    "level": level,
                    "iteration": it,
                    "moved": changed,
                    "want_move": want_move,
                    "wall_ms": int(1000 * (time.time() - t0)),
                }
            )
            if want_move == 0:
                # true fixpoint: no vertex has a positive-gain move left
                did_converge = True
                break

    edges.unpersist()
    verts.unpersist()
    # total_moved counts batch-boundary supersteps only when
    # check_interval > 1; the level loop uses an exact identity test
    # instead of this for its early exit
    return comm, it, did_converge, total_moved


def louvain(
    graph: Graph,
    max_iterations: int = 10,
    weighted: bool = False,
    compute_community_count: bool = False,
    levels: int = 1,
    check_interval: int = 1,
) -> LouvainResult:
    """``graph`` is used as-is — pass an undirected (both-direction)
    graph for reference semantics (its loader uses
    ``withDirection(BOTH).asUndirected(true)``, ``LouvainTest.java:122-128``).

    ``levels``: number of coarsening levels (default 1 = reference
    parity).  Each extra level contracts communities to super-nodes
    (weights summed, intra edges as self-loops — 2m invariant) and
    reruns the move phase; stops early when a level's final communities
    are the identity (contraction would be a no-op, and the restarted
    deterministic schedule would replay the same non-moves).

    ``check_interval``: run the materializing moved/wants aggregate
    every k supersteps instead of every superstep (one driver job per
    k lazily-checkpointed levels).  Fixpoint supersteps are no-ops, so
    detection is delayed by < k no-op iterations; community
    assignments are identical and the unrolled driver oracle (which
    always replays ``max_iterations``) is invariant to it."""
    spark = graph.spark
    wexpr = (
        F.col("weight").cast("double")
        if weighted and "weight" in graph.edges.columns
        else F.lit(1.0)
    )
    # ONE evaluation of the user's edge subtree: the vertex set derives
    # from the same edges DataFrame that _one_level persists (its first
    # aggregate materializes deg/verts/edges off one cache), instead of
    # graph.vertices re-running the user's edge SQL.
    edges = graph.edges.select("src", "dst", wexpr.alias("weight"))
    if graph._vertices is not None:  # noqa: SLF001
        vertices = graph.vertices.select("id")
    else:
        vertices = (
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .distinct()
        )

    metrics: list[dict] = []
    assignment: DataFrame | None = None
    total_iters = 0
    did_converge = True
    levels_ran = 0
    for level in range(1, max(1, int(levels)) + 1):
        comm, iters, conv, _moved = _one_level(
            spark, edges, vertices, max_iterations, level, metrics, check_interval
        )
        levels_ran = level
        total_iters += iters
        did_converge = did_converge and conv
        if assignment is None:
            assignment = comm
        else:
            # compose: orig → level-(l-1) community → level-l community
            assignment = (
                assignment.join(
                    comm.select(
                        F.col("id").alias("community"),
                        F.col("community").alias("new_c"),
                    ),
                    "community",
                )
                .select("id", F.col("new_c").alias("community"))
            )
            assignment = truncate_lineage(assignment)
        if level < max(1, int(levels)):
            # exact "did anything merge" test (batch-boundary move
            # counts undercount with check_interval > 1): identity
            # communities ⇒ contraction is a no-op and the restarted
            # schedule would replay the same non-moves — stop.
            if comm.filter(F.col("id") != F.col("community")).limit(1).count() == 0:
                break
            cmap = comm
            edges = (
                edges.join(
                    cmap.select(
                        F.col("id").alias("src"), F.col("community").alias("csrc")
                    ),
                    "src",
                )
                .join(
                    cmap.select(
                        F.col("id").alias("dst"), F.col("community").alias("cdst")
                    ),
                    "dst",
                )
                .groupBy(F.col("csrc").alias("src"), F.col("cdst").alias("dst"))
                .agg(F.sum("weight").alias("weight"))
            )
            vertices = cmap.select(F.col("community").alias("id")).distinct()

    count = None
    if compute_community_count:
        count = assignment.select("community").distinct().count()
    return LouvainResult(
        communities=assignment,
        iterations_ran=total_iters,
        did_converge=did_converge,
        community_count=count,
        metrics=metrics,
        levels_ran=levels_ran,
    )


def _labeled_undirected_edges(graph: Graph, assignment: DataFrame):
    """``(e, m)`` — canonical undirected weighted edges with both
    endpoints' community labels attached ``(cs, cd, weight)``
    (lineage-cut), plus the total edge weight ``m``.  Shared by the
    community-scoring metrics (modularity, conductance)."""
    und = graph.canonical_undirected_edges()
    if "weight" in graph.edges.columns:
        w = graph.edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).filter(F.col("src") != F.col("dst")).groupBy("src", "dst").agg(
            F.max("weight").alias("weight")
        )
        und = w
    else:
        und = und.withColumn("weight", F.lit(1.0))
    a = assignment.select(F.col("id"), F.col("community"))
    e = (
        und.join(
            a.select(F.col("id").alias("src"), F.col("community").alias("cs")).hint(
                "SHUFFLE_HASH"
            ),
            "src",
        ).join(
            a.select(F.col("id").alias("dst"), F.col("community").alias("cd")).hint(
                "SHUFFLE_HASH"
            ),
            "dst",
        )
    )
    e = truncate_lineage(e.select("cs", "cd", "weight"))
    m = e.agg(F.sum("weight")).collect()[0][0] or 0.0
    return e, float(m)


def modularity(graph: Graph, assignment: DataFrame) -> DataFrame:
    """Per-community Newman modularity decomposition — one row per
    community ``(community, intra_weight, degree_weight, contribution)``
    with ``Q = Σ contribution = Σ_c (e_c/m − (d_c/(2m))²)`` over the
    undirected weighted graph (the quantity Louvain greedily improves;
    GDS-era ``modularity`` stats shape).

    ``assignment`` is ``(id, community)`` — any community labeling
    (Louvain output, WCC components, an external partition).

    Scale shape: canonical undirected edges joined to the assignment on
    both endpoints (two co-keyed SHJ joins), then two map-side-combined
    aggregates — no windows, no driver-side math beyond the final sum
    the caller performs (``agg(sum(contribution))``)."""
    e, m = _labeled_undirected_edges(graph, assignment)
    if m == 0.0:
        return graph.spark.createDataFrame(
            [],
            "community long, intra_weight double, degree_weight double, "
            "contribution double",
        )
    intra = (
        e.filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.sum("weight").alias("intra_weight"))
    )
    deg = (
        e.select(F.col("cs").alias("community"), "weight")
        .unionAll(e.select(F.col("cd").alias("community"), "weight"))
        .groupBy("community")
        .agg(F.sum("weight").alias("degree_weight"))
    )
    # Both sides arrive hash-partitioned on community from their
    # aggregates; hint SHJ so the exchange-free join hashes the smaller
    # intra side instead of sorting both (stats-less post-agg frames
    # otherwise fall back to sort-merge).
    return deg.join(intra.hint("SHUFFLE_HASH"), "community", "left").select(
        "community",
        F.coalesce("intra_weight", F.lit(0.0)).alias("intra_weight"),
        "degree_weight",
        (
            F.coalesce("intra_weight", F.lit(0.0)) / F.lit(float(m))
            - (F.col("degree_weight") / F.lit(2.0 * float(m))) ** 2
        ).alias("contribution"),
    )


def conductance(graph: Graph, assignment: DataFrame) -> DataFrame:
    """Per-community conductance — one row per community
    ``(community, cut_weight, volume, conductance)`` with
    ``φ(c) = cut(c) / min(vol(c), 2m − vol(c))`` over the undirected
    weighted graph, ``cut(c)`` the weight of edges with exactly one
    endpoint in ``c`` and ``vol(c) = 2·intra(c) + cut(c)`` (GDS-era
    ``conductance`` stats shape — the boundary-quality twin of
    ``modularity``).  ``conductance`` is NULL for a community whose
    smaller side has zero volume (isolated or all-covering label).

    Scale shape: identical to ``modularity`` — two co-keyed SHJ joins
    attach the labels, then two map-side-combined aggregates over
    community keys; nothing corpus-sized survives the partial agg."""
    e, m = _labeled_undirected_edges(graph, assignment)
    if m == 0.0:
        return graph.spark.createDataFrame(
            [], "community long, cut_weight double, volume double, conductance double"
        )
    intra = (
        e.filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("community"))
        .agg(F.sum("weight").alias("intra_weight"))
    )
    cut = (
        e.filter(F.col("cs") != F.col("cd"))
        .select(F.col("cs").alias("community"), "weight")
        .unionAll(
            e.filter(F.col("cs") != F.col("cd")).select(
                F.col("cd").alias("community"), "weight"
            )
        )
        .groupBy("community")
        .agg(F.sum("weight").alias("cut_weight"))
    )
    # communities may appear only in intra (no boundary) or only in cut
    joined = intra.join(cut.hint("SHUFFLE_HASH"), "community", "full").select(
        "community",
        F.coalesce("cut_weight", F.lit(0.0)).alias("cut_weight"),
        (
            F.lit(2.0) * F.coalesce("intra_weight", F.lit(0.0))
            + F.coalesce("cut_weight", F.lit(0.0))
        ).alias("volume"),
    )
    small_side = F.least(F.col("volume"), F.lit(2.0 * m) - F.col("volume"))
    return joined.select(
        "community",
        "cut_weight",
        "volume",
        F.when(small_side > 0.0, F.col("cut_weight") / small_side).alias("conductance"),
    )
