"""k-truss subgraph — iterative support peeling over the wedge join.

Beyond-reference (GDS-era ``gds.alpha.ktruss`` shape; the reference
stops at triangle counting, ``algo/.../TriangleProc.java``): the
k-truss is the maximal edge subgraph in which every edge participates
in at least ``k-2`` triangles *within the subgraph* — the standard
cohesive-core definition (Cohen 2008).  Trusses are the
triangle-analogue of k-cores: denser, and robust to the single-edge
bridges that inflate cores.

Spark shape: each peel round re-enumerates triangles on the surviving
edge set with the same degree-oriented wedge join as
``operators/triangles.py`` (out-fan bounded by O(√m) per vertex — hub
skew cannot explode the self-join), scatters each triangle to its
three member edges, and keeps edges with support ≥ k-2.  Kept ⊆
current, so an unchanged edge *count* is an exact fixpoint test (no
checksum needed).  Rounds are bounded by the peeling depth (≤ |E| in
theory, a handful in practice); each round is a fresh bounded-fan-out
wedge plan, so the operator holds at 100× — the cost driver is the
triangle enumeration itself, which is the best known distributed
truss strategy (one wedge join + one semi join per round).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCache, aqe_suspended, truncate_lineage
from .triangles import _wedge_triangles


@dataclass
class KTrussResult:
    edges: DataFrame               # (src long, dst long), src < dst
    k: int
    iterations_ran: int
    edge_count: int
    metrics: list[dict] = field(default_factory=list)


def _orient_by_degree(e: DataFrame) -> DataFrame:
    """Degree-orient a canonical (src < dst) edge set: low (degree, id)
    endpoint → high, with both endpoint degrees attached — the input
    shape ``_wedge_triangles`` expects.  Degrees are of the *current*
    peeled subgraph, recomputed per round."""
    deg = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    j = (
        e.join(deg.select(F.col("id").alias("src"), F.col("degree").alias("adeg")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("degree").alias("bdeg")), "dst")
    )
    fwd = (F.col("adeg") < F.col("bdeg")) | (
        (F.col("adeg") == F.col("bdeg")) & (F.col("src") < F.col("dst"))
    )
    return j.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        F.when(fwd, F.col("adeg")).otherwise(F.col("bdeg")).alias("sdeg"),
        F.when(fwd, F.col("bdeg")).otherwise(F.col("adeg")).alias("ddeg"),
    )


def k_truss(graph: Graph, k: int, max_iterations: int = 100) -> KTrussResult:
    """Edges of the k-truss of the undirected simple graph.

    ``k >= 2``; the 2-truss is the input edge set itself (every edge
    trivially has ≥ 0 triangles).  Returns canonical ``src < dst``
    rows."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    spark = graph.spark
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    min_sup = k - 2
    with aqe_suspended(spark):
        cache = SuperstepCache(spark)
        edges = truncate_lineage(
            graph.canonical_undirected_edges()
            .select("src", "dst")
            .repartition(n_part, "src")
        )
        cache.track(edges)
        n_edges = edges.count()
        metrics: list[dict] = []
        it = 0
        while it < max_iterations and n_edges > 0 and min_sup > 0:
            it += 1
            t0 = time.time()
            ori = truncate_lineage(_orient_by_degree(edges))
            cache.track(edges, ori)  # keep both live while kept builds
            tri = _wedge_triangles(ori)
            sup = (
                tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
                .unionAll(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
                .unionAll(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
                .groupBy("src", "dst")
                .agg(F.count(F.lit(1)).alias("sup"))
                .filter(F.col("sup") >= min_sup)
                .select("src", "dst")
            )
            kept = truncate_lineage(
                edges.join(sup.hint("SHUFFLE_HASH"), ["src", "dst"], "left_semi"),
                eager=False,
            )
            n_kept = kept.count()
            cache.track(kept)
            metrics.append(
                {
                    "algorithm": "k_truss",
                    "iteration": it,
                    "edges": int(n_kept),
                    "removed": int(n_edges - n_kept),
                    "wall_ms": int(1000 * (time.time() - t0)),
                }
            )
            stable = n_kept == n_edges  # kept ⊆ edges → equal count = equal set
            edges, n_edges = kept, n_kept
            if stable:
                break
    return KTrussResult(
        edges=edges,
        k=k,
        iterations_ran=it,
        edge_count=int(n_edges),
        metrics=metrics,
    )
