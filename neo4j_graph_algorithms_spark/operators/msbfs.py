"""Multi-source BFS kernel + closeness / harmonic centrality.

Reference: ``core/.../msbfs/MultiSourceBFS.java:33-416`` — the
"The More the Merrier" bitset trick (ω=32 sources per machine word,
``OMEGA`` at ``:79``): one BFS pass serves a whole batch of sources by
OR-ing per-source visit bits.  The trick survives translation intact:
the frontier DataFrame carries a packed ``mask`` long (ω=62 sources per
batch here), and the level expansion is

    next = edges ⋈ frontier(src) → groupBy(dst).agg(bit_or(mask))
           minus already-seen bits

Consumers (per the reference):
- closeness (``impl/MSClosenessCentrality.java:33-96``):
  ``farness[v] += popcount(mask)·depth`` per level (``:62-66``),
  centrality = (n-1)/farness (0 for isolated), with the optional
  Wasserman-Faust component correction ignored, as in the default.
- harmonic (``impl/MSHarmonicCentrality.java:30-77``):
  ``Σ popcount/depth``, normalized by (n-1).

Source batching bounds memory: ``batch_size`` ≤ 62 sources per sweep,
batches run sequentially (each is a full BFS of ≤ diameter supersteps).
For centralities at 10^12 scale you sample sources (``sample``) — the
same estimator RA-Brandes uses for betweenness.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph import Graph
from ..plans.checkpoint import SuperstepCache, truncate_lineage

OMEGA = 62  # sources per long mask (sign bit avoided)


def _popcount(col):
    return F.bit_count(col)


def _message_edges(graph: Graph, direction_both: bool = True) -> DataFrame:
    """Deduped (optionally doubled) BFS message edges — built once and
    shared across source batches by the centrality drivers, so the
    user's edge subtree (arbitrary SQL) is evaluated once per RUN, not
    once per OMEGA-sized batch."""
    e = graph.edges.select("src", "dst")
    if direction_both:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return e.dropDuplicates(["src", "dst"])


def msbfs_levels(
    graph: Graph,
    sources: list[int],
    direction_both: bool = True,
    max_depth: int | None = None,
    message_edges: DataFrame | None = None,
) -> DataFrame:
    """``(id, source_idx, depth)`` — BFS depth from each source in
    ``sources`` (≤ OMEGA per call) to every reachable vertex.
    Depth 0 rows (source itself) included.  ``message_edges``: a
    caller-persisted table from :func:`_message_edges` (the caller owns
    its lifetime); omitted → built and released per call."""
    assert len(sources) <= OMEGA, f"at most {OMEGA} sources per batch"
    spark = graph.spark
    owned = message_edges is None
    if owned:
        e = _message_edges(graph, direction_both).persist()
    else:
        e = message_edges

    src_df = spark.createDataFrame(
        [(int(s), 1 << i) for i, s in enumerate(sources)], "id long, bit long"
    )
    seen = src_df.groupBy("id").agg(F.sum("bit").alias("seen_mask"))
    frontier = seen.select("id", F.col("seen_mask").alias("mask"))
    out_rows = [frontier.select("id", F.col("mask"), F.lit(0).alias("depth"))]
    cache = SuperstepCache(spark)

    depth = 0
    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src").hint("SHUFFLE_HASH"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.bit_or("mask").alias("new_mask"))
        )
        nxt = (
            nxt.join(seen, "id", "left")
            .select(
                "id",
                F.col("new_mask")
                .bitwiseAND(F.bitwise_not(F.coalesce(F.col("seen_mask"), F.lit(0))))
                .alias("mask"),
                F.coalesce(F.col("seen_mask"), F.lit(0)).alias("seen_mask"),
            )
            .filter(F.col("mask") != 0)
        )
        nxt = truncate_lineage(nxt, eager=False)
        if nxt.isEmpty():
            break
        out_rows.append(nxt.select("id", "mask", F.lit(depth).alias("depth")))
        # retire only the seen-chain: each level's frontier (nxt) stays
        # cached — the final union consumes every level — but seen(t-1)
        # is dead once seen(t) materializes.  track() reads the RDD id
        # off seen's own plan, so nxt is never captured.
        seen = truncate_lineage(  # eager
            seen.join(nxt.select("id", "mask"), "id", "full")
            .select(
                "id",
                F.coalesce(F.col("seen_mask"), F.lit(0))
                .bitwiseOR(F.coalesce(F.col("mask"), F.lit(0)))
                .alias("seen_mask"),
            )
        )
        cache.track(seen)
        frontier = nxt.select("id", "mask")

    if owned:
        e.unpersist()
    masked = out_rows[0]
    for r in out_rows[1:]:
        masked = masked.unionByName(r)
    # unpack mask → source_idx via the bit positions present
    bits = spark.createDataFrame(
        [(i, 1 << i) for i in range(len(sources))], "source_idx int, bit long"
    )
    return (
        masked.join(bits, F.col("mask").bitwiseAND(F.col("bit")) != 0)
        .select("id", "source_idx", "depth")
    )


@dataclass
class CentralityResult:
    centrality: DataFrame          # (id long, centrality double)
    sources_used: int


def iter_source_batches(vertices: DataFrame, sample, batch_size: int):
    """Yield BFS-source id batches of ``batch_size`` without ever
    holding the full vertex set on the driver: sample mode slices the
    given list; exact mode streams partitions via ``toLocalIterator``
    (one partition resident at a time), so exact all-sources centrality
    on a 10^9-vertex graph never materializes 10^9 ids driver-side."""
    if sample is not None:
        for i in range(0, len(sample), batch_size):
            yield [int(s) for s in sample[i : i + batch_size]]
        return
    batch: list[int] = []
    for row in vertices.select("id").toLocalIterator():
        batch.append(int(row["id"]))
        if len(batch) == batch_size:
            yield batch
            batch = []
    if batch:
        yield batch


def _batched_depth_sums(
    graph: Graph, source_batches, harmonic: bool,
    message_edges: DataFrame | None = None,
):
    """Σ depth (farness) or Σ 1/depth per vertex over all sources.
    Returns ``(acc, n_sources)``; ``source_batches`` is an iterable of
    id lists (≤ OMEGA each).  The BFS message table is built/persisted
    ONCE for all batches (one user-subtree evaluation per run)."""
    spark = graph.spark
    owned = message_edges is None
    e = (
        _message_edges(graph).persist() if owned else message_edges
    )
    acc = None
    n_sources = 0
    for batch in source_batches:
        n_sources += len(batch)
        lv = msbfs_levels(graph, batch, message_edges=e).filter(F.col("depth") > 0)
        contrib = lv.groupBy("id").agg(
            (
                F.sum(1.0 / F.col("depth")) if harmonic else F.sum(F.col("depth").cast("double"))
            ).alias("s"),
            F.count(F.lit(1)).alias("reached"),
        )
        acc = contrib if acc is None else (
            acc.unionByName(contrib)
            .groupBy("id")
            .agg(F.sum("s").alias("s"), F.sum("reached").alias("reached"))
        )
        acc = truncate_lineage(acc)
    if owned:
        e.unpersist()  # acc is eagerly checkpointed per batch
    return acc, n_sources


def closeness_centrality(graph: Graph, sample: list[int] | None = None) -> CentralityResult:
    """``(n-1)/farness`` (``MSClosenessCentrality.java:87-92``); 0 when
    farness is 0.  ``sample`` restricts BFS sources (estimator mode);
    exact mode streams the source set in OMEGA-sized chunks."""
    e = _message_edges(graph).persist()
    # vertex table: eager checkpoint (NOT persist-then-unpersist — the
    # returned centrality DataFrame is lazy and re-reads it on
    # consumption); src side of the doubled message table covers every
    # vertex, so this is one user-subtree evaluation total
    if graph._vertices is None:  # noqa: SLF001
        vertices = truncate_lineage(e.select(F.col("src").alias("id")).distinct())
    else:
        vertices = truncate_lineage(graph.vertices.select("id"))
    n = vertices.count()
    acc, n_sources = _batched_depth_sums(
        graph, iter_source_batches(vertices, sample, OMEGA), harmonic=False,
        message_edges=e,
    )
    e.unpersist()
    cent = vertices.join(acc.hint("SHUFFLE_HASH"), "id", "left").select(
        "id",
        F.when(
            F.coalesce(F.col("s"), F.lit(0.0)) > 0, F.lit(float(n - 1)) / F.col("s")
        )
        .otherwise(0.0)
        .alias("centrality"),
    )
    return CentralityResult(centrality=cent, sources_used=n_sources)


def harmonic_centrality(graph: Graph, sample: list[int] | None = None) -> CentralityResult:
    """``Σ 1/dist / (n-1)`` (``MSHarmonicCentrality.java:59,68``)."""
    e = _message_edges(graph).persist()
    if graph._vertices is None:  # noqa: SLF001 — same shape as closeness
        vertices = truncate_lineage(e.select(F.col("src").alias("id")).distinct())
    else:
        vertices = truncate_lineage(graph.vertices.select("id"))
    n = vertices.count()
    acc, n_sources = _batched_depth_sums(
        graph, iter_source_batches(vertices, sample, OMEGA), harmonic=True,
        message_edges=e,
    )
    e.unpersist()
    cent = vertices.join(acc.hint("SHUFFLE_HASH"), "id", "left").select(
        "id",
        (F.coalesce(F.col("s"), F.lit(0.0)) / F.lit(float(max(n - 1, 1)))).alias(
            "centrality"
        ),
    )
    return CentralityResult(centrality=cent, sources_used=n_sources)


def all_shortest_paths_unweighted(
    graph: Graph, sources: list[int] | None = None, direction_both: bool = True
) -> DataFrame:
    """``(source, target, distance)`` stream — MS-BFS variant of
    ``algo.allShortestPaths.stream`` (``impl/MSBFSAllShortestPaths.java``).
    O(n²) output: pass ``sources`` to bound it at scale (exact mode
    streams the source set in OMEGA-sized chunks, never collecting all
    vertex ids driver-side)."""
    spark = graph.spark
    # one message-table build + one vertex derivation for ALL batches
    e = _message_edges(graph, direction_both).persist()
    if sources is None and graph._vertices is None:  # noqa: SLF001
        src_col = (
            e.select(F.col("src").alias("id")).distinct()
            if direction_both
            else e.select(F.col("src").alias("id"))
            .union(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        verts = truncate_lineage(src_col)
    else:
        verts = graph.vertices
    out = None
    for batch in iter_source_batches(verts, sources, OMEGA):
        idx = spark.createDataFrame(
            [(j, int(s)) for j, s in enumerate(batch)], "source_idx int, source long"
        )
        lv = msbfs_levels(
            graph, batch, direction_both=direction_both, message_edges=e
        ).join(F.broadcast(idx), "source_idx")
        part = lv.select(
            "source", F.col("id").alias("target"), F.col("depth").cast("double").alias("distance")
        )
        out = part if out is None else out.unionByName(part)
    e.unpersist()  # every level is already checkpointed per batch
    return out
