"""Minimum spanning tree / forest — Borůvka rounds.

Reference: ``algo.mst`` = sequential Prim from a start node over the
undirected weighted graph (``impl/MSTPrim.java:22-60``).  Prim's greedy
queue has no distributed analogue, but Borůvka produces the same tree
when edge weights are distinct (and *a* minimum spanning forest in
general, same total weight).  Per round:

  1. each component picks its lightest outgoing edge — ties broken by
     the GLOBAL canonical order ``(weight, min(src,dst), max(src,dst))``.
     Under that lexicographic perturbation every edge weight is unique,
     so the MSF itself is unique and algorithm-independent: Borůvka,
     Kruskal, and Prim under the same order all return this exact edge
     set (which is what makes the result oracle-checkable);
  2. chosen edges merge components via pointer-jump min-label collapse.

O(log n) rounds, each a join + two aggregations — textbook
DataFrame-parallel MST.  ``mst(graph)`` returns the forest edges; the
per-start-node tree of the reference is the forest component containing
``start_node``.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import truncate_lineage


@dataclass
class MstResult:
    edges: DataFrame               # (src long, dst long, weight double)
    total_weight: float
    rounds: int


def minimum_spanning_forest(graph: Graph, max_rounds: int = 64) -> MstResult:
    """Borůvka MSF over the undirected view of ``graph``."""
    und = (
        graph.edges.select("src", "dst", "weight")
        .union(
            graph.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
        .persist()
    )
    comp = truncate_lineage(
        graph.vertices.select("id", F.col("id").alias("comp"))
    )
    chosen = None
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        ec = (
            und.join(comp.select(F.col("id").alias("src"), F.col("comp").alias("cs")).hint("SHUFFLE_HASH"), "src")
            .join(comp.select(F.col("id").alias("dst"), F.col("comp").alias("cd")).hint("SHUFFLE_HASH"), "dst")
            .filter(F.col("cs") != F.col("cd"))
        )
        if ec.isEmpty():
            break
        # lightest outgoing edge per component; ties broken by the
        # canonical global key (weight, lo, hi) so the picked set is
        # the unique perturbed-order MSF regardless of which side of
        # the edge a component sees
        pick = (
            ec.groupBy("cs")
            .agg(
                F.min_by(
                    F.struct("src", "dst", "weight", "cd"),
                    F.struct(
                        F.col("weight"),
                        F.least("src", "dst").alias("lo"),
                        F.greatest("src", "dst").alias("hi"),
                    ),
                ).alias("m")
            )
            .select(
                F.col("m.src").alias("src"),
                F.col("m.dst").alias("dst"),
                F.col("m.weight").alias("weight"),
                F.col("cs"),
                F.col("m.cd").alias("cd"),
            )
        )
        # canonical undirected form avoids double-adding the same edge
        new_edges = pick.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        ).dropDuplicates(["src", "dst"])
        chosen = new_edges if chosen is None else chosen.unionByName(new_edges).dropDuplicates(["src", "dst"])
        chosen = truncate_lineage(chosen)
        # merge components: min-label propagation over picked merge pairs
        merge = pick.select(F.col("cs").alias("a"), F.col("cd").alias("b"))
        merge = merge.union(merge.select(F.col("b").alias("a"), F.col("a").alias("b")))
        lbl = merge.select(F.col("a").alias("comp_old")).distinct().select(
            "comp_old", F.col("comp_old").alias("comp_new")
        )
        lbl = truncate_lineage(lbl)
        while True:
            cand = (
                merge.join(lbl.withColumnRenamed("comp_old", "a"), "a")
                .groupBy(F.col("b").alias("comp_old"))
                .agg(F.min("comp_new").alias("cand"))
            )
            nxt = lbl.join(cand, "comp_old", "left").select(
                "comp_old",
                F.least(F.col("comp_new"), F.coalesce(F.col("cand"), F.col("comp_new"))).alias("comp_new"),
                (F.coalesce(F.col("cand"), F.col("comp_new")) < F.col("comp_new")).alias("ch"),
            )
            nxt = truncate_lineage(nxt)
            if nxt.filter(F.col("ch")).isEmpty():
                lbl = nxt.select("comp_old", "comp_new")
                break
            lbl = nxt.select("comp_old", "comp_new")
        comp = truncate_lineage(
            comp.join(lbl.withColumnRenamed("comp_old", "comp"), "comp", "left")
            .select("id", F.coalesce("comp_new", "comp").alias("comp"))
        )

    und.unpersist()
    if chosen is None:
        empty = graph.spark.createDataFrame([], "src long, dst long, weight double")
        return MstResult(edges=empty, total_weight=0.0, rounds=rounds)
    total = chosen.agg(F.sum("weight")).first()[0] or 0.0
    return MstResult(edges=chosen, total_weight=float(total), rounds=rounds)


def mst(graph: Graph, start_node: int) -> MstResult:
    """Reference-shaped ``algo.mst``: the MSF component containing
    ``start_node`` (Prim from a start node spans exactly that
    component)."""
    msf = minimum_spanning_forest(graph)
    from .wcc import wcc as _wcc

    forest = Graph(msf.edges, vertices=graph.vertices)
    comps = _wcc(forest).components
    target = comps.filter(F.col("id") == start_node).select(
        F.col("set_id").alias("sid")
    )
    keep = comps.join(F.broadcast(target), comps["set_id"] == target["sid"]).select("id")
    kept = (
        msf.edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
    )
    total = kept.agg(F.sum("weight")).first()[0] or 0.0
    return MstResult(edges=kept, total_weight=float(total), rounds=msf.rounds)
