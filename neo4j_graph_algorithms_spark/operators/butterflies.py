"""Butterfly (2x2-biclique / 4-cycle) counting for bipartite graphs.

Beyond-reference: the bipartite analogue of triangle counting
(Sanei-Mehri, Sariyuce & Tirthapura, KDD'18 "Butterfly Counting in
Bipartite Networks").  A butterfly is a complete 2x2 biclique
(c1-s1, c1-s2, c2-s1, c2-s2) — the smallest cohesion motif a
bipartite graph admits (triangles are impossible), and the base of
bipartite clustering coefficients and k-bitruss decompositions.
Customer x supplier / user x item / doc x term graphs are where it
applies in this engine.

Algorithm: enumerate wedges centered on the LEFT layer (a customer c
with right-neighbors s1 < s2 yields wedge endpoint pair (s1, s2));
``cnt(s1, s2)`` wedges over the same endpoint pair make
``C(cnt, 2)`` butterflies, each counted exactly once because a
butterfly's two left vertices are its two wedge centers.

Scale shape: one self-join of the edge table on ``src`` (SHUFFLE_HASH,
co-partitioned — edges arrive hash-partitioned by src from the
dedup), producing Σ_c C(deg(c), 2) wedge rows that are immediately
collapsed by a map-side-combined ``groupBy(s1, s2)``.  The wedge
count is the real cost driver, so ``max_center_degree`` (the KDD'18
vertex-priority mitigation, simplified to a cap) bounds the per-hub
blowup: hyper-hub centers above the cap are excluded and reported,
keeping the enumeration exact over the retained subgraph — the same
explicit-guard convention as ``ngram_jaccard_pairs.max_shingle_df``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import truncate_lineage


@dataclass
class ButterflyResult:
    total: int                    # butterflies in the (capped) graph
    per_right: DataFrame          # (id, butterflies) — right-layer vertices
    skipped_centers: int          # left vertices excluded by the cap


def butterflies(
    graph: Graph,
    max_center_degree: int | None = None,
) -> ButterflyResult:
    """Count butterflies of the bipartite edge set ``(src=left,
    dst=right)``.  ``per_right`` lists right-layer vertices in at
    least one butterfly with their butterfly participation count."""
    e = graph.edges.select("src", "dst").dropDuplicates()
    skipped = 0
    if max_center_degree is not None:
        deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
        hubs = deg.filter(F.col("d") > max_center_degree).select("src")
        skipped = hubs.count()
        if skipped:
            e = e.join(hubs, "src", "left_anti")
    e = truncate_lineage(e)
    pairs = (
        e.alias("a")
        .join(e.alias("b").hint("SHUFFLE_HASH"), "src")
        .filter(F.col("a.dst") < F.col("b.dst"))
        .groupBy(F.col("a.dst").alias("r1"), F.col("b.dst").alias("r2"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    # C(cnt,2): cnt*(cnt-1) is even, division exact below 2^53
    bf = (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long").alias("bf")
    pairs = truncate_lineage(pairs.select("r1", "r2", bf))
    row = pairs.agg(F.sum("bf").alias("t")).first()
    total = int(row["t"]) if row["t"] is not None else 0
    per_right = (
        pairs.select(F.col("r1").alias("id"), "bf")
        .unionByName(pairs.select(F.col("r2").alias("id"), "bf"))
        .groupBy("id")
        .agg(F.sum("bf").alias("butterflies"))
    )
    return ButterflyResult(total=total, per_right=per_right, skipped_centers=skipped)
