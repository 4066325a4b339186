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
  hashes), not O(stream) — and with ``state_ttl_ms`` set, idle hashes
  are evicted on a processing-time timeout, bounding state to the
  hashes active within one TTL window.

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


def _make_dedup_fn(ttl_ms: int | None):
    """Build the stateful dedup function; with a TTL the state arms a
    processing-time timeout on every update and is REMOVED when it
    fires — a hash idle longer than the TTL is forgotten and its next
    arrival becomes first-seen again (the bounded-state contract)."""

    def _dedup_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # timeout invocation: no rows for this key this batch —
            # evict and emit nothing
            state.remove()
            return
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
                out,
                columns=["text_hash", "doc_id", "keep_id", "is_duplicate", "dup_index"],
            )
        state.update((keep_id, seen))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return _dedup_fn


def streaming_dedup_first_seen(
    docs: DataFrame, text_col: str = "text", state_ttl_ms: int | None = None
) -> DataFrame:
    """Stateful exact dedup over a document stream: rows grouped by
    ``md5(text)``; per group the state remembers the first-seen doc_id
    (within a batch, the smallest doc_id — deterministic) and how many
    rows the hash has produced so far.

    State contract: without ``state_ttl_ms`` the state is O(distinct
    hashes) FOREVER — exact dedup against the whole history, the right
    default for bounded corpora but unbounded on an infinite stream
    (the mergeable-CMS twin ``streaming_cms_term_counts`` is the
    strictly-bounded alternative).  With ``state_ttl_ms`` set, each
    hash's state is evicted after that much processing-time idleness
    (``GroupStateTimeout.ProcessingTimeTimeout``): state size becomes
    O(hashes seen within one TTL window) and a duplicate arriving
    after the window is re-reported as first-seen — the standard
    windowed-dedup trade at 100 TB/day ingest rates."""
    keyed = docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col("doc_id"))
    return keyed.groupBy("text_hash").applyInPandasWithState(
        _make_dedup_fn(state_ttl_ms),
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


NEARDUP_OUT_SCHEMA = (
    "band int, band_hash string, doc_id long, keep_id long, is_candidate_duplicate boolean"
)
NEARDUP_STATE_SCHEMA = "keep_id long"


def _neardup_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    keep = state.get[0] if state.exists else None
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        ids = pd.concat(chunks)["doc_id"].sort_values()
        out = []
        for doc_id in ids:
            if keep is None:
                keep = int(doc_id)
            out.append((int(key[0]), key[1], int(doc_id), keep, int(doc_id) != keep))
        yield pd.DataFrame(
            out,
            columns=["band", "band_hash", "doc_id", "keep_id", "is_candidate_duplicate"],
        )
    state.update((keep,))


def streaming_near_dedup_minhash(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_size: int = 3,
) -> DataFrame:
    """Streaming MinHash-LSH near-duplicate candidates: a doc whose
    LSH band collides with any previously-seen doc is emitted flagged
    with that first-seen ``keep_id`` (one row per colliding band; a
    consumer dedups on doc_id).

    The signature is computed ROW-LOCALLY (a higher-order ``aggregate``
    fold over the row's own shingle array — no shuffle, so it is legal
    ahead of the stateful operator; the per-element interpretation cost
    is fine at micro-batch sizes), using the SAME hash family as the
    batch ``dedup.minhash_signatures`` — streaming buckets therefore
    equal batch buckets, asserted in tests.  State per (band, bucket)
    is one long: O(distinct buckets), not O(stream)."""
    from ..functions.textstats import shingles, tokens

    sh = F.array_distinct(shingles(tokens(F.col(text_col)), shingle_size))

    def row_hashes(s):
        cols = []
        for i in range(num_hashes):
            j, half = divmod(i, 2)
            md = F.md5(F.concat(F.lit(f"{j}:"), s))
            cols.append(
                F.conv(F.substring(md, 1 + 16 * half, 15), 16, 10).cast("long")
            )
        return F.array(*cols)

    init = F.array_repeat(F.lit(1 << 62).cast("long"), num_hashes)  # > any 60-bit hash
    sig = F.aggregate(
        sh, init, lambda acc, s: F.zip_with(acc, row_hashes(s), lambda a, b: F.least(a, b))
    )
    rows = num_hashes // bands
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[sig[b * rows + r].cast("string") for r in range(rows)]
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = (
        docs.filter(F.size(sh) > 0)
        .select(F.col("doc_id"), F.explode(F.array(*band_structs)).alias("bh"))
        .select(
            F.col("bh.band").alias("band"),
            F.col("bh.band_hash").alias("band_hash"),
            "doc_id",
        )
    )
    return banded.groupBy("band", "band_hash").applyInPandasWithState(
        _neardup_fn,
        outputStructType=NEARDUP_OUT_SCHEMA,
        stateStructType=NEARDUP_STATE_SCHEMA,
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


def streaming_sessions(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessionization: one row per (user, session) with the
    session bounds and aggregates.  ``session_window`` merges events
    whose gaps are under ``gap``; the watermark closes sessions once no
    earlier event can still arrive — O(open sessions) state, the
    streaming twin of the batch ``q_events_sessions`` oracle query
    (session_end = last event + gap, Spark's session-window contract)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


def streaming_cms_sketch(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """``(j, b, c)`` — a count-min sketch maintained AS the streaming
    aggregation state: every micro-batch folds its term occurrences
    into the depth × width counter table.

    This is the streaming twin of ``textstats.cms_term_counts`` with
    the same md5 bucket function, so the running counters equal the
    batch sketch over the union of all micro-batches — exactly, not
    approximately (the sketch's error is in the *estimates*, never the
    counters).  The whole point of a sketch under streaming: the
    aggregation state is bounded at depth·width rows FOREVER, no matter
    how many terms stream past — heavy-hitter tracking over an
    unbounded corpus with O(1) state, where an exact
    ``groupBy(term).count()`` stream would grow state with the
    vocabulary.  Estimates read off the sink table via
    ``min over rows`` per probe term (one broadcast join against the
    depth·width table, as in the batch path)."""
    from ..functions.textstats import cms_bucket, tokens

    terms = docs.select(F.explode(tokens(F.col(text_col))).alias("term"))
    pairs = terms.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), cms_bucket(F.col("term"), j, width).alias("b")
                    )
                    for j in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.j", "p.b")
    return pairs.groupBy("j", "b").agg(F.count(F.lit(1)).alias("c"))
