"""Structured-Streaming surfaces: incremental graph/corpus maintenance.

The reference has no streaming at all (SURVEY.md §2.4) — a batch-only
procedure library.  A 100 TB pipeline, however, ingests continuously;
these operators keep the engine's inputs fresh without re-scanning:

- ``streaming_edge_counts``: running (src,dst) multiplicities — the
  accumulate-weights load mode, incrementally.
- ``streaming_degrees``: running out-degrees per vertex (update mode) —
  the input PageRank needs refreshed between runs.
- ``streaming_window_stats``: watermarked tumbling-window event stats —
  late data dropped after the watermark, matching the batch
  ``events_window_counts`` query shape.

All take a streaming DataFrame (``spark.readStream``) and return the
transformed streaming DataFrame; callers own the sink/trigger so tests
drive them with ``format("memory")`` + ``processAllAvailable``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_edge_counts(edges: DataFrame) -> DataFrame:
    """``(src, dst, weight)`` running parallel-edge accumulation."""
    return (
        edges.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("weight"))
    )


def streaming_degrees(edges: DataFrame) -> DataFrame:
    """``(id, out_degree)`` running counts."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def streaming_window_stats(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums by event_type."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
