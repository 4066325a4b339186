"""Neighbor-similarity / link prediction over the undirected graph.

Beyond the reference's procedure surface (it has no similarity procs —
they arrived in the successor GDS library as ``gds.nodeSimilarity``);
included here because candidate-pair scoring is a core link-graph
primitive for training-data pipelines (entity dedup, related-item
mining, graph features for rankers).

Metrics per vertex pair (a < b) sharing ≥ ``min_common`` neighbors:

- ``jaccard``      |N(a)∩N(b)| / |N(a)∪N(b)|
- ``overlap``      |N(a)∩N(b)| / min(|N(a)|, |N(b)|)
- ``adamic_adar``  Σ_{w ∈ N(a)∩N(b)} 1 / ln(deg(w))

Spark shape: wedge self-join on the shared neighbor — the SAME
candidate-generation bound as triangle counting (never all-pairs; cost
= Σ_w deg(w)², controllable via ``max_neighbor_degree``, the standard
stop-hub guard: a degree-10^6 hub contributes 10^12 wedge pairs but
~zero signal, so pipelines drop it from *candidate generation* while
keeping exact counts for surviving pairs).  All aggregation is
map-side combined; no Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import truncate_lineage

METRICS = ("jaccard", "overlap", "adamic_adar")


def neighbor_similarity(
    graph: Graph,
    metric: str = "jaccard",
    min_common: int = 1,
    threshold: float = 0.0,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """``(id_a, id_b, common, score)`` for vertex pairs of the
    undirected view sharing ≥ ``min_common`` neighbors and scoring
    ≥ ``threshold``; ``id_a < id_b``.

    ``max_neighbor_degree`` drops shared neighbors above that degree
    from *candidate generation* (wedge pruning); common counts and
    degrees of surviving pairs stay exact over the pruned wedge set.
    """
    if metric not in METRICS:
        raise ValueError(f"metric must be one of {METRICS}, got {metric!r}")
    und = graph.canonical_undirected_edges()          # src < dst, deduped
    # materialize once: inc feeds both wedge sides plus the degree
    # table — without the cut each reference re-scans the edge source
    inc = truncate_lineage(
        und.select(F.col("src").alias("n"), F.col("dst").alias("w")).union(
            und.select(F.col("dst").alias("n"), F.col("src").alias("w"))
        )
    )
    deg = truncate_lineage(
        inc.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    )
    wedge_src = inc
    if max_neighbor_degree is not None:
        keep = deg.filter(F.col("deg") <= max_neighbor_degree).select(
            F.col("n").alias("w")
        )
        wedge_src = inc.join(keep, "w", "left_semi")
    a = wedge_src.select(F.col("n").alias("id_a"), "w")
    b = wedge_src.select(F.col("n").alias("id_b"), "w")
    pair_aggs = [F.count(F.lit(1)).alias("common")]
    if metric == "adamic_adar":
        # weight of the shared neighbor, joined once on the wedge rows
        a = a.join(
            deg.select(F.col("n").alias("w"), F.col("deg").alias("wdeg")).hint(
                "SHUFFLE_HASH"
            ),
            "w",
        )
        pair_aggs.append(F.sum(1.0 / F.log(F.col("wdeg"))).alias("aa"))
    # SHJ: hash one incidence branch instead of sorting both, and keep
    # the (possibly huge) pair stream unsorted through the degree joins
    pairs = (
        a.join(b.hint("SHUFFLE_HASH"), "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(*pair_aggs)
        .filter(F.col("common") >= min_common)
    )
    da = deg.select(F.col("n").alias("id_a"), F.col("deg").alias("da"))
    db = deg.select(F.col("n").alias("id_b"), F.col("deg").alias("db"))
    scored = pairs.join(da.hint("SHUFFLE_HASH"), "id_a").join(
        db.hint("SHUFFLE_HASH"), "id_b"
    )
    if metric == "jaccard":
        score = F.col("common") / (F.col("da") + F.col("db") - F.col("common"))
    elif metric == "overlap":
        score = F.col("common") / F.least(F.col("da"), F.col("db"))
    else:
        score = F.col("aa")
    return (
        scored.select(
            "id_a",
            "id_b",
            F.col("common").cast("long").alias("common"),
            F.round(score, 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )
