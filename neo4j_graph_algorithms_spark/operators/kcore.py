"""k-core decomposition — iterative peeling + h-index coreness.

Beyond the reference's procedure surface (k-core arrived in the
successor GDS library as ``gds.kcore``); included as a core link-graph
primitive: the k-core is the standard "dense enough to matter"
subgraph filter, and coreness the standard vertex-robustness feature.

- ``k_core(graph, k)``: the maximal subgraph where every vertex has
  undirected degree ≥ k.  Superstep = recompute degrees over the
  surviving set, drop vertices below k; repeat to fixpoint.  Each
  round is one join + one aggregation; number of rounds is the peeling
  depth (≤ diameter-ish in practice).
- ``core_numbers(graph)``: every vertex's coreness at once via the
  h-operator iteration (Lü et al., "The H-index of a network node"):
  start at est = degree, repeatedly set est(v) to the h-index of its
  neighbors' estimates; the fixpoint is the core number.  The h-index
  aggregation is ``max(least(est, row_number))`` over neighbor
  estimates sorted descending — a per-vertex window, shuffle-partition
  friendly (the window key is the vertex id, so no global sort).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCache, truncate_lineage


@dataclass
class KCoreResult:
    vertices: DataFrame            # (id long)
    edges: DataFrame               # surviving undirected edges (src < dst)
    rounds: int


def k_core(
    graph: Graph, k: int, max_rounds: int = 10_000, check_interval: int = 1
) -> KCoreResult:
    """Vertices/edges of the k-core of the undirected view.

    ``check_interval``: run the materializing edge-count (the fixpoint
    test) every c rounds over lazily-checkpointed levels — peeling past
    the fixpoint is a no-op (every surviving vertex already has
    degree ≥ k), so the subgraph is identical and ``rounds`` may
    overshoot by < c."""
    und = truncate_lineage(graph.canonical_undirected_edges().select("src", "dst"))
    cache = SuperstepCache(graph.spark)
    cache.track(und)
    n_edges = und.count()
    k_check = max(1, int(check_interval))
    pending: list[DataFrame] = []
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        inc = und.select(F.col("src").alias("id")).union(
            und.select(F.col("dst").alias("id"))
        )
        keep = (
            inc.groupBy("id")
            .agg(F.count(F.lit(1)).alias("deg"))
            .filter(F.col("deg") >= k)
            .select("id")
        )
        nxt = (
            und.join(keep.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst").hint("SHUFFLE_HASH"), "dst", "left_semi")
        )
        nxt = truncate_lineage(nxt, eager=False)
        pending.append(nxt)
        und = nxt
        if rounds % k_check == 0 or rounds >= max_rounds:
            after = nxt.count()
            cache.track(*pending)
            pending = []
            if after == n_edges:
                break
            n_edges = after
    verts = und.select(F.col("src").alias("id")).union(
        und.select(F.col("dst").alias("id"))
    ).distinct()
    return KCoreResult(vertices=verts, edges=und.select("src", "dst"), rounds=rounds)


@dataclass
class CoreNumbersResult:
    core: DataFrame                # (id long, core long)
    iterations_ran: int
    metrics: list[dict] = field(default_factory=list)


def core_numbers(
    graph: Graph, max_iterations: int = 10_000, check_interval: int = 1
) -> CoreNumbersResult:
    """``(id, core)`` — coreness of every vertex of the undirected view
    (isolated vertices get 0).

    ``check_interval``: materialize the changed-count every c
    iterations (h-operator past the fixpoint is a no-op — estimates
    are monotone non-increasing and stationary at the core number), so
    results are identical and ``iterations_ran`` may overshoot by
    < c."""
    und = truncate_lineage(graph.canonical_undirected_edges().select("src", "dst"))
    inc = truncate_lineage(
        und.select(F.col("src").alias("id"), F.col("dst").alias("nbr")).union(
            und.select(F.col("dst").alias("id"), F.col("src").alias("nbr"))
        )
    )
    est = inc.groupBy("id").agg(F.count(F.lit(1)).cast("long").alias("est"))
    cache = SuperstepCache(graph.spark)
    est = truncate_lineage(est)
    cache.track(est, inc, und)
    it = 0
    k_check = max(1, int(check_interval))
    pending: list[DataFrame] = []
    w = Window.partitionBy("id").orderBy(F.desc("nbr_est"))
    while it < max_iterations:
        it += 1
        nbr_est = inc.join(
            est.select(F.col("id").alias("nbr"), F.col("est").alias("nbr_est")).hint(
                "SHUFFLE_HASH"
            ),
            "nbr",
        ).select("id", "nbr_est")
        h = (
            nbr_est.withColumn("rn", F.row_number().over(w))
            .groupBy("id")
            .agg(F.max(F.least(F.col("nbr_est"), F.col("rn"))).alias("h"))
        )
        nxt = est.join(h.hint("SHUFFLE_HASH"), "id", "left").select(
            "id",
            F.least(F.col("est"), F.coalesce(F.col("h"), F.lit(0))).cast("long").alias("est"),
            (F.least(F.col("est"), F.coalesce(F.col("h"), F.lit(0))) < F.col("est")).alias("ch"),
        )
        nxt = truncate_lineage(nxt, eager=False)
        pending.append(nxt)
        est = nxt.select("id", "est")
        if it % k_check == 0 or it >= max_iterations:
            # the ch flag is per-iteration; a no-change iteration is
            # absorbing for the h-operator (est stationary thereafter),
            # so "last iteration of the batch unchanged" ⟺ fixpoint
            changed = nxt.filter(F.col("ch")).count()
            cache.track(*pending, inc, und)
            pending = []
            if changed == 0:
                break
    core = graph.vertices.select("id").join(est.hint("SHUFFLE_HASH"), "id", "left").select(
        "id", F.coalesce("est", F.lit(0)).cast("long").alias("core")
    )
    return CoreNumbersResult(core=core, iterations_ran=it)
