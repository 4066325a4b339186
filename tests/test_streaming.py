"""Structured-Streaming operators driven by a file source into a memory
sink (batch parquet replayed as a stream)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from neo4j_graph_algorithms_spark.streaming import (
    streaming_dedup_first_seen,
    streaming_degrees,
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
