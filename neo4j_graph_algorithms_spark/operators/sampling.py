"""Random-walk subgraph sampling — training-subgraph extraction.

Beyond-reference (GDS-era ``gds.graph.sample.rwr`` shape): take the
vertices visited by deterministic random walks from a seed set, return
the subgraph they induce.  The standard way to cut a trainable,
topology-preserving sample out of a 10^12-edge graph — walk-based
sampling preserves degree and clustering distributions far better than
uniform edge sampling (Leskovec & Faloutsos, KDD'06).

Determinism: walks are ``operators/walks.py`` md5-hash walks — the
sample is a pure function of (graph, seeds, walk_length,
walks_per_node, seed), replayable in the SQL oracle.

Scale shape: the walk supersteps (one co-partitioned join per step),
one distinct on visited vertices, then two semi joins to induce the
edge set — no collects, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import truncate_lineage
from .walks import random_walks


def sample_subgraph(
    graph: Graph,
    seeds: DataFrame,
    walk_length: int = 6,
    walks_per_node: int = 1,
    seed: int = 0,
    direction_both: bool = True,
) -> Graph:
    """Induced subgraph on the vertices visited by deterministic walks
    from ``seeds`` (an ``(id)`` DataFrame).  Seeds themselves are always
    in the sample (walk step 0)."""
    res = random_walks(
        graph,
        walk_length=walk_length,
        walks_per_node=walks_per_node,
        seed=seed,
        direction_both=direction_both,
        start_vertices=seeds,
    )
    vs = truncate_lineage(
        res.steps.select(F.col("vertex").alias("id")).distinct()
    )  # eager: vs owns its data now
    res.release()  # retire the per-step walk checkpoints
    e = graph.edges.join(
        vs.select(F.col("id").alias("src")).hint("SHUFFLE_HASH"), "src", "left_semi"
    ).join(
        vs.select(F.col("id").alias("dst")).hint("SHUFFLE_HASH"), "dst", "left_semi"
    )
    return Graph(e, vertices=vs, default_weight=graph.default_weight)


def neighbor_sample(
    graph: Graph,
    seeds: DataFrame,
    fanouts: tuple[int, ...] = (10, 5),
    salt: str = "sage",
) -> DataFrame:
    """``(hop, src, dst)`` — GraphSAGE-style fixed-fanout k-hop neighbor
    sampling (Hamilton et al., NeurIPS'17): hop 0 samples up to
    ``fanouts[0]`` out-neighbors of each seed; hop h samples up to
    ``fanouts[h]`` out-neighbors of the (deduplicated) hop-(h-1)
    frontier.  The sampled blocks are the mini-batch message-flow
    graph a GNN trainer consumes.

    Deterministic: per source vertex the kept neighbors are the
    ``fanout`` smallest by ``md5(salt:hop:src:dst)`` — a pure function
    of (graph, seeds, salt), stable under retries/partitioning and
    replayable by the SQL oracle (no RNG state).

    Scale shape: per hop, one SHUFFLE_HASH semi-join of the edge table
    against the frontier (frontier-sized, shrinks or grows with the
    sample — never corpus-sized), then a per-src rank window.  The
    window partitions by ``src``, so its sort is per-vertex
    (O(deg·log deg) per task at worst); a hub lands in one task —
    acceptable for sampling because the output is capped at ``fanout``
    rows per vertex, and AQE skew-split handles pathological hubs.
    Frontiers are deduplicated between hops (sample per unique vertex,
    not per seed-path), so cost is bounded by the distinct reachable
    set, not the fanout product."""
    from pyspark.sql import Window as W

    if not fanouts or any(f <= 0 for f in fanouts):
        raise ValueError("fanouts must be non-empty positive ints")
    edges = graph.edges.select("src", "dst")
    frontier = truncate_lineage(seeds.select(F.col(seeds.columns[0]).alias("src")).distinct())
    blocks: DataFrame | None = None
    for hop, fanout in enumerate(fanouts):
        rk = F.md5(
            F.concat_ws(
                ":",
                F.lit(salt),
                F.lit(str(hop)),
                F.col("src").cast("string"),
                F.col("dst").cast("string"),
            )
        )
        cand = edges.join(frontier.hint("SHUFFLE_HASH"), "src", "left_semi")
        w = W.partitionBy("src").orderBy(rk.alias("rk"), "dst")
        sampled = (
            cand.select("src", "dst", F.row_number().over(w).alias("rn"))
            .filter(F.col("rn") <= fanout)
            .select(F.lit(hop).alias("hop"), "src", "dst")
        )
        sampled = truncate_lineage(sampled)
        blocks = sampled if blocks is None else blocks.unionByName(sampled)
        frontier = truncate_lineage(
            sampled.select(F.col("dst").alias("src")).distinct()
        )
    assert blocks is not None
    return blocks
