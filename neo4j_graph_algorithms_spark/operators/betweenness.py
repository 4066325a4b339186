"""Betweenness centrality — Brandes accumulation as level-synchronous
DataFrame sweeps.

Reference: exact all-sources Brandes
(``impl/betweenness/BetweennessCentrality.java:27-60``, paper cited at
``:24``), parallel variant (``ParallelBetweennessCentrality.java``),
and RA-Brandes random-source sampling
(``impl/betweenness/RABrandesBetweennessCentrality.java:30-70``).
Unweighted BFS DAGs, OUTGOING direction.

Spark shape — all sources of a batch processed in the same DataFrames,
keyed (source, id):

forward:  levels(source, id, depth, sigma) by BFS supersteps;
          sigma(v) = Σ sigma of predecessors one level up.
backward: for depth d = max..1:
          delta(v at d-1) += Σ_{w succ} sigma_v/sigma_w · (1 + delta_w)
          centrality[v] += delta(v)  (v ≠ source)

Exact BC = all sources (O(V·E) total work — the reference's cost too);
``sample`` gives the RA-Brandes estimator: centrality scaled by
n/|sample| (``RABrandesBetweennessCentrality.java`` scales the same
way).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import truncate_lineage


@dataclass
class BetweennessResult:
    centrality: DataFrame          # (id long, centrality double)
    sources_used: int


def _forward_levels(
    edges: DataFrame, sources: list[int], spark, max_depth: int | None = None
) -> DataFrame:
    """BFS DAG levels with path counts: (source, id, depth, sigma);
    ``max_depth`` truncates the BFS (the reference's
    ``MaxDepthBetweennessCentrality`` estimator)."""
    frontier = spark.createDataFrame(
        [(int(s), int(s), 0, 1.0) for s in sources],
        "source long, id long, depth int, sigma double",
    )
    seen = frontier.select("source", "id")
    levels = [frontier]
    depth = 0
    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        nxt = (
            edges.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("source", F.col("dst").alias("id"), F.col("sigma"))
            .join(seen, ["source", "id"], "left_anti")
            .groupBy("source", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("depth", F.lit(depth))
            .select("source", "id", "depth", "sigma")
        )
        nxt = truncate_lineage(nxt, eager=False)
        if nxt.isEmpty():
            break
        levels.append(nxt)
        seen = truncate_lineage(seen.unionByName(nxt.select("source", "id")))
        frontier = nxt
    out = levels[0]
    for l in levels[1:]:
        out = out.unionByName(l)
    return truncate_lineage(out), depth - 1


def betweenness_centrality(
    graph: Graph,
    sample: list[int] | None = None,
    direction_both: bool = False,
    batch_size: int = 64,
    max_depth: int | None = None,
) -> BetweennessResult:
    """Exact (``sample=None``) or sampled (RA-Brandes) betweenness;
    ``max_depth`` bounds each BFS (reference
    ``impl/betweenness/MaxDepthBetweennessCentrality.java`` — paths
    longer than the cap contribute nothing, an estimator for
    small-world graphs where long dependencies are negligible)."""
    spark = graph.spark
    e = graph.edges.select("src", "dst").dropDuplicates()
    if direction_both:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).dropDuplicates()
    e = e.persist()
    vertices = graph.vertices.select("id").persist()
    n = vertices.count()

    from .msbfs import iter_source_batches

    acc = None
    n_sources = 0
    for batch in iter_source_batches(vertices, sample, batch_size):
        n_sources += len(batch)
        levels, got_depth = _forward_levels(e, batch, spark, max_depth)
        levels = levels.persist()
        delta = levels.select("source", "id", F.lit(0.0).alias("delta"))
        # backward accumulation, one superstep per depth level
        for d in range(got_depth, 0, -1):
            down = (
                levels.filter(F.col("depth") == d)
                .join(delta, ["source", "id"])
                .select("source", F.col("id").alias("dst"), "sigma", "delta")
            )
            contrib = (
                e.join(down, "dst")
                .select("source", F.col("src").alias("id"), F.col("sigma").alias("sw"), "delta")
                .join(
                    levels.filter(F.col("depth") == d - 1).select(
                        "source", "id", F.col("sigma").alias("sv")
                    ),
                    ["source", "id"],
                )
                .groupBy("source", "id")
                .agg(F.sum(F.col("sv") / F.col("sw") * (1.0 + F.col("delta"))).alias("add"))
            )
            delta = (
                delta.join(contrib, ["source", "id"], "left")
                .select(
                    "source",
                    "id",
                    (F.col("delta") + F.coalesce(F.col("add"), F.lit(0.0))).alias("delta"),
                )
            )
            delta = truncate_lineage(delta)
        part = (
            delta.filter(F.col("id") != F.col("source"))
            .groupBy("id")
            .agg(F.sum("delta").alias("c"))
        )
        acc = part if acc is None else (
            acc.unionByName(part).groupBy("id").agg(F.sum("c").alias("c"))
        )
        acc = truncate_lineage(acc)
        levels.unpersist()

    scale = float(n) / n_sources if sample is not None and n_sources else 1.0
    cent = vertices.join(acc.hint("SHUFFLE_HASH"), "id", "left").select(
        "id", (F.coalesce(F.col("c"), F.lit(0.0)) * F.lit(scale)).alias("centrality")
    )
    e.unpersist()
    vertices.unpersist()
    return BetweennessResult(centrality=cent, sources_used=n_sources)
