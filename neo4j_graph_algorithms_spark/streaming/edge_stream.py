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
- ``streaming_dedup_first_seen``: custom stateful operator
  (``applyInPandasWithState``) — exact streaming dedup keyed on the
  content hash: the first-seen doc per hash survives, later arrivals
  are emitted flagged ``is_duplicate`` with the surviving id.  State
  per key is one (keep_id, count) pair, so state size is O(distinct
  hashes), not O(stream).

All take a streaming DataFrame (``spark.readStream``) and return the
transformed streaming DataFrame; callers own the sink/trigger so tests
drive them with ``format("memory")`` + ``processAllAvailable``.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


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


DEDUP_OUT_SCHEMA = (
    "text_hash string, doc_id long, keep_id long, is_duplicate boolean, dup_index long"
)
DEDUP_STATE_SCHEMA = "keep_id long, seen long"


def _dedup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        keep_id, seen = state.get
    else:
        keep_id, seen = None, 0
    # Buffer the whole group before choosing keep_id: a group spanning
    # multiple Arrow chunks within one micro-batch must still pick the
    # batch-global minimum doc_id, not the first chunk's minimum.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        ids = pd.concat(chunks)["doc_id"].sort_values()
        out = []
        for doc_id in ids:
            if keep_id is None:
                keep_id = int(doc_id)
            seen += 1
            out.append(
                (key[0], int(doc_id), keep_id, int(doc_id) != keep_id, seen - 1)
            )
        yield pd.DataFrame(
            out, columns=["text_hash", "doc_id", "keep_id", "is_duplicate", "dup_index"]
        )
    state.update((keep_id, seen))


def streaming_dedup_first_seen(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateful exact dedup over a document stream: rows grouped by
    ``md5(text)``; per group the state remembers the first-seen doc_id
    (within a batch, the smallest doc_id — deterministic) and how many
    rows the hash has produced so far."""
    keyed = docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col("doc_id"))
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
