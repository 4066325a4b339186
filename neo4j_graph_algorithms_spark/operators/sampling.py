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
