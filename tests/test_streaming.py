"""Structured-Streaming operators driven by a file source into a memory
sink (batch parquet replayed as a stream)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neo4j_graph_algorithms_spark.streaming import (
    streaming_dedup_first_seen,
    streaming_degrees,
    streaming_sessions,
    streaming_window_stats,
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _drain(q):
    q.processAllAvailable()
    q.stop()


def test_streaming_window_stats_matches_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    # the file stream source requires a directory
    stage = str(tmp_path / "events_dir")
    spark.read.parquet(src).write.parquet(stage)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
    out = streaming_window_stats(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_stats")
        .start()
    )
    _drain(q)
    got = {
        (r["window_start"], r["event_type"]): (r["n"], round(r["total_value"], 6))
        for r in spark.sql("SELECT * FROM win_stats").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    want = {(r["w"]["start"], r["event_type"]): (r["n"], round(r["v"], 6)) for r in batch}
    assert got == want


def test_streaming_degrees(spark, tmp_path):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    p = str(tmp_path / "edges")
    edges.write.parquet(p)
    stream = spark.readStream.schema("src long, dst long").parquet(p)
    q = (
        streaming_degrees(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("deg")
        .start()
    )
    _drain(q)
    got = {r["id"]: r["out_degree"] for r in spark.sql("SELECT * FROM deg").collect()}
    assert got == {0: 2, 1: 1}


def test_streaming_dedup_first_seen_stateful(spark, tmp_path):
    # two micro-batches in one directory stream: state must carry the
    # first batch's keep_id into the second
    d = tmp_path / "docs"
    d.mkdir()
    b1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "doc_id long, text string"
    )
    b1.coalesce(1).write.mode("append").parquet(str(d))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(d))
    q = (
        streaming_dedup_first_seen(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    q.processAllAvailable()
    # second batch arrives: new dup of "alpha" + a fresh text
    b2 = spark.createDataFrame(
        [(4, "alpha"), (5, "gamma")], "doc_id long, text string"
    )
    b2.coalesce(1).write.mode("append").parquet(str(d))
    q.processAllAvailable()
    q.stop()
    rows = {
        r["doc_id"]: (r["keep_id"], r["is_duplicate"], r["dup_index"])
        for r in spark.sql("SELECT * FROM dedup_stream").collect()
    }
    assert rows[1] == (1, False, 0)
    assert rows[3] == (1, True, 1)
    assert rows[4] == (1, True, 2)   # state survived across batches
    assert rows[2] == (2, False, 0)
    assert rows[5] == (5, False, 0)


def test_streaming_near_dedup_minhash(spark, tmp_path):
    from neo4j_graph_algorithms_spark.streaming import streaming_near_dedup_minhash
    from neo4j_graph_algorithms_spark.functions import dedup as dd

    base = (
        "the quick brown fox jumps over the lazy dog and keeps on running "
        "through the quiet green field toward the river"
    )
    near = base + " bank"        # near-duplicate of base
    other = (
        "completely different content about spark structured streaming "
        "stateful operators and watermark semantics in micro batches"
    )
    d = tmp_path / "docs_nd"
    d.mkdir()
    # batch 1: the original + unrelated doc
    spark.createDataFrame(
        [(1, base), (5, other)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(d))
    stream = spark.readStream.schema("doc_id long, text string").parquet(str(d))
    q = (
        streaming_near_dedup_minhash(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("near_dedup")
        .start()
    )
    q.processAllAvailable()
    # batch 2: the near-duplicate arrives later — state must flag it
    spark.createDataFrame(
        [(9, near)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(d))
    _drain(q)
    rows = spark.sql("select * from near_dedup").collect()
    flagged = {r["doc_id"]: r["keep_id"] for r in rows if r["is_candidate_duplicate"]}
    assert flagged == {9: 1}                      # near-dup caught across batches
    assert all(not r["is_candidate_duplicate"] for r in rows if r["doc_id"] in (1, 5))

    # streaming band buckets equal the batch minhash pipeline's buckets
    batch = spark.createDataFrame(
        [(1, base), (5, other), (9, near)], "doc_id long, text string"
    )
    batch_pairs = {
        (r["id_a"], r["id_b"]) for r in dd.minhash_lsh_candidates(batch).collect()
    }
    assert batch_pairs == {(1, 9)}


def test_incremental_wcc_batch_equals_full_recompute(spark):
    """Folding edge batches incrementally must yield bit-identical
    (id, set_id) to batch wcc over the accumulated edge set — labels
    are min member ids in both, so equality is exact."""
    from neo4j_graph_algorithms_spark import Graph, wcc
    from neo4j_graph_algorithms_spark.streaming import incremental_wcc_batch

    batches = [
        [(1, 2), (3, 4), (10, 11)],          # three components
        [(2, 3), (20, 21)],                  # merge {1,2}+{3,4}, new comp
        [(11, 20), (4, 10)],                 # merge everything but nothing new
        [(30, 31)],                          # disjoint again
    ]
    comp = None
    seen = []
    for b in batches:
        seen += b
        df = spark.createDataFrame(b, "src long, dst long")
        comp = incremental_wcc_batch(comp, df)
        full = wcc(Graph.from_edge_list(spark, seen)).components
        inc = {(r["id"], r["set_id"]) for r in comp.collect()}
        ref = {(r["id"], r["set_id"]) for r in full.select("id", "set_id").collect()}
        assert inc == ref, (sorted(inc), sorted(ref))


def test_streaming_incremental_wcc(spark, tmp_path):
    """End-to-end over a file-source stream: components table converges
    to the batch answer as files arrive, surviving across micro-batches
    via the versioned parquet state."""
    from neo4j_graph_algorithms_spark import Graph, wcc
    from neo4j_graph_algorithms_spark.streaming import (
        IncrementalWccSink,
        streaming_incremental_wcc,
    )

    src_dir = tmp_path / "edges_in"
    src_dir.mkdir()
    state = str(tmp_path / "wcc_state")
    ckpt = str(tmp_path / "wcc_ckpt")

    b1 = [(1, 2), (3, 4)]
    spark.createDataFrame(b1, "src long, dst long").write.parquet(
        str(src_dir / "b1.parquet")
    )
    stream = spark.readStream.schema("src long, dst long").parquet(
        str(src_dir) + "/*"
    )
    q = streaming_incremental_wcc(stream, state, ckpt)
    try:
        q.processAllAvailable()
        b2 = [(2, 3), (5, 6)]
        spark.createDataFrame(b2, "src long, dst long").write.parquet(
            str(src_dir / "b2.parquet")
        )
        q.processAllAvailable()
    finally:
        q.stop()

    comp = IncrementalWccSink(spark, state).components()
    got = {(r["id"], r["set_id"]) for r in comp.collect()}
    full = wcc(Graph.from_edge_list(spark, b1 + b2)).components
    ref = {(r["id"], r["set_id"]) for r in full.select("id", "set_id").collect()}
    assert got == ref, (sorted(got), sorted(ref))


def test_streaming_sessions_matches_batch(spark, tmp_path):
    src = "/root/testdata/sf0.001/events.parquet"
    stage = str(tmp_path / "events_sess_dir")
    spark.read.parquet(src).write.parquet(stage)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(stage)
    out = streaming_sessions(stream)
    q = (
        out.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess")
        .start()
    )
    _drain(q)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (
            r["n_events"],
            round(r["total_value"], 6),
        )
        for r in spark.sql("SELECT * FROM sess").collect()
    }
    batch = (
        spark.read.parquet(src)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    )
    want = {
        (r["user_id"], r["w"]["start"], r["w"]["end"]): (r["n"], round(r["v"], 6))
        for r in batch
    }
    assert got == want
