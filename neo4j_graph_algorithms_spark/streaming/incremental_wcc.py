"""Streaming incremental connected components.

The reference computes WCC from scratch on every ``CALL algo.unionFind``
(``impl/GraphUnionFind.java:41-106``); there is no incremental or
streaming path anywhere in it.  A continuously-ingesting link graph
wants the components table *maintained*, not recomputed — this module
keeps ``(id, set_id)`` current over an edge stream with per-batch work
proportional to the batch, not the graph:

1. **Contract**: map each new edge's endpoints to their current
   ``set_id`` (one left join against the components table; unseen
   vertices seed ``set_id = id``).  Edges inside one component vanish;
   what survives is a tiny graph over *component ids*.
2. **Solve**: run the engine's min-label WCC fixpoint on that
   contracted graph — supersteps bounded by the batch's merge diameter,
   scanning only batch-derived rows.
3. **Relabel**: one join of the components table against the (old
   set_id → new set_id) mapping.  Because every stored ``set_id`` is
   already the min member id of its component, the merged label is the
   min member id of the merged component — bit-identical to what batch
   ``wcc`` over the full accumulated edge set would output
   (asserted in tests).

At 100 TB the components table is the big side and it is touched by
exactly one hash join + one parquet rewrite per micro-batch; the
fixpoint loop never sees it.  State lives as parquet versioned by
Structured Streaming's ``batch_id`` (``components_b{batch_id}``), so a
replayed batch overwrites its own output — idempotent, resume-safe —
and the latest version is discovered by listing, never by mutating a
file in place.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph import Graph
from ..operators.wcc import wcc

_STATE_RE = re.compile(r"^components_b(\d+)$")


def incremental_wcc_batch(
    components: DataFrame | None,
    new_edges: DataFrame,
    max_iterations: int = 100,
) -> DataFrame:
    """One micro-batch update: fold ``new_edges (src, dst)`` into the
    ``(id, set_id)`` table and return the new table.  Pure DataFrame →
    DataFrame, usable without streaming (e.g. nightly delta loads)."""
    spark = new_edges.sparkSession
    if components is None:
        components = spark.createDataFrame([], "id long, set_id long")

    batch_vertices = (
        new_edges.select(F.col("src").cast("long").alias("id"))
        .unionByName(new_edges.select(F.col("dst").cast("long").alias("id")))
        .distinct()
    )
    # current label per batch vertex; unseen vertices seed with own id
    lab = batch_vertices.join(components, "id", "left").select(
        "id", F.coalesce("set_id", F.col("id")).alias("set_id")
    )

    # contracted edge list over component ids — the only graph the
    # fixpoint sees; its size is bounded by the batch, not the history
    s1 = lab.select(F.col("id").alias("src"), F.col("set_id").alias("s1"))
    s2 = lab.select(F.col("id").alias("dst"), F.col("set_id").alias("s2"))
    contracted = (
        new_edges.select(F.col("src").cast("long").alias("src"),
                         F.col("dst").cast("long").alias("dst"))
        .join(s1, "src")
        .join(s2, "dst")
        .select("s1", "s2")
        .filter(F.col("s1") != F.col("s2"))
        .distinct()
    )

    # grow the table with the batch's unseen vertices first
    grown = components.unionByName(
        lab.join(components.select("id"), "id", "left_anti")
    )

    if contracted.isEmpty():
        return grown

    mapping = (
        wcc(Graph.from_edges(contracted, src="s1", dst="s2"),
            max_iterations=max_iterations)
        .components.select(
            F.col("id").alias("set_id"), F.col("set_id").alias("new_set")
        )
    )
    return grown.join(mapping, "set_id", "left").select(
        "id", F.coalesce("new_set", F.col("set_id")).alias("set_id")
    )


class IncrementalWccSink:
    """``foreachBatch`` sink maintaining the components table under
    ``state_dir`` (parquet, versioned by batch id)."""

    def __init__(self, spark: SparkSession, state_dir: str):
        self.spark = spark
        self.state_dir = state_dir
        os.makedirs(state_dir, exist_ok=True)

    def _versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.state_dir):
            m = _STATE_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def components(self, before_batch: int | None = None) -> DataFrame | None:
        """Latest components table (optionally: latest strictly before
        ``before_batch`` — what a replayed batch must rebuild from)."""
        versions = self._versions()
        if before_batch is not None:
            versions = [v for v in versions if v < before_batch]
        if not versions:
            return None
        return self.spark.read.parquet(
            os.path.join(self.state_dir, f"components_b{versions[-1]}")
        )

    def __call__(self, new_edges: DataFrame, batch_id: int) -> None:
        prev = self.components(before_batch=int(batch_id))
        new = incremental_wcc_batch(prev, new_edges)
        new.write.mode("overwrite").parquet(
            os.path.join(self.state_dir, f"components_b{int(batch_id)}")
        )


def streaming_incremental_wcc(
    edges: DataFrame, state_dir: str, checkpoint_dir: str
):
    """Attach the incremental-WCC sink to a streaming edge DataFrame;
    returns the (started) StreamingQuery.  ``state_dir`` holds the
    versioned components parquet; ``checkpoint_dir`` is the stream's
    own offset log."""
    sink = IncrementalWccSink(edges.sparkSession, state_dir)
    return (
        edges.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start()
    )
