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


def test_streaming_dedup_state_ttl_evicts_idle_hashes(spark, tmp_path):
    # state_ttl_ms=1: any hash idle for a full micro-batch gap is
    # evicted, so (a) a post-TTL duplicate is re-reported first-seen
    # and (b) the state store stays bounded by the active window.
    # A timeout-configured stream otherwise runs NO-DATA micro-batches
    # continuously to advance timers (making processAllAvailable spin
    # forever); disabling them pins evictions to data batches, which
    # is all this test needs to observe.
    import time

    from neo4j_graph_algorithms_spark.streaming import streaming_dedup_first_seen

    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        d = tmp_path / "docs_ttl"
        d.mkdir()
        stream = spark.readStream.schema("doc_id long, text string").parquet(str(d))
        q = (
            streaming_dedup_first_seen(stream, state_ttl_ms=1)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("dedup_ttl_stream")
            .start()
        )
        b1 = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "doc_id long, text string"
        )
        b1.coalesce(1).write.mode("append").parquet(str(d))
        q.processAllAvailable()
        time.sleep(0.05)  # > TTL of processing-time idleness
        # this batch carries no "alpha"/"beta" rows, so their expired
        # state gets the timeout invocation and is removed
        b2 = spark.createDataFrame([(3, "gamma")], "doc_id long, text string")
        b2.coalesce(1).write.mode("append").parquet(str(d))
        q.processAllAvailable()
        time.sleep(0.05)
        b3 = spark.createDataFrame([(4, "alpha")], "doc_id long, text string")
        b3.coalesce(1).write.mode("append").parquet(str(d))
        q.processAllAvailable()
        prog = q.lastProgress
        q.stop()
    finally:
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    rows = {
        r["doc_id"]: (r["keep_id"], r["is_duplicate"], r["dup_index"])
        for r in spark.sql("SELECT * FROM dedup_ttl_stream").collect()
    }
    assert rows[1] == (1, False, 0)
    # post-TTL "alpha" is first-seen AGAIN: evicted state, fresh counter
    assert rows[4] == (4, False, 0)
    # the store holds at most the hashes of the last TTL window, not
    # every hash ever seen
    assert prog["stateOperators"][0]["numRowsTotal"] <= 2


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


def _sink_state(spark, tmp_path, name, **kw):
    from neo4j_graph_algorithms_spark.streaming import IncrementalWccSink

    return IncrementalWccSink(spark, str(tmp_path / name), **kw)


def _comp_set(df):
    return {(r["id"], r["set_id"]) for r in df.collect()}


def test_incremental_sink_rewrites_only_touched_buckets(spark, tmp_path):
    """The O(touched) contract: a micro-batch rewrites exactly the
    buckets containing its own vertices; every other bucket's version
    is carried forward by reference in the manifest."""
    from pyspark.sql import functions as F

    from neo4j_graph_algorithms_spark import Graph, wcc

    n_buckets = 8
    sink = _sink_state(spark, tmp_path, "st1", n_buckets=n_buckets)
    b0 = [(i, i + 100) for i in range(1, 30)]  # spread over all buckets
    sink(spark.createDataFrame(b0, "src long, dst long"), 0)
    man0 = sink.manifest()
    assert man0["metrics"]["buckets_rewritten"] == len(man0["buckets"])

    # batch 1 touches few vertices -> few buckets
    b1 = [(1, 2), (3, 4)]
    df1 = spark.createDataFrame(b1, "src long, dst long")
    verts = {r[0] for r in df1.select("src").collect()} | {
        r[0] for r in df1.select("dst").collect()
    }
    expect_ks = {
        r["k"]
        for r in spark.createDataFrame([(v,) for v in verts], "id long")
        .select(F.pmod(F.xxhash64("id"), F.lit(n_buckets)).alias("k"))
        .distinct()
        .collect()
    }
    sink(df1, 1)
    man1 = sink.manifest()
    assert man1["metrics"]["buckets_rewritten"] == len(expect_ks)
    rewritten = {int(k) for k, v in man1["buckets"].items() if v == 1}
    assert rewritten == expect_ks
    carried = {int(k) for k, v in man1["buckets"].items() if v == 0}
    assert carried == {int(k) for k in man0["buckets"]} - expect_ks

    # and the maintained view still equals the batch answer
    full = wcc(Graph.from_edge_list(spark, b0 + b1)).components
    assert _comp_set(sink.components()) == _comp_set(
        full.select("id", "set_id")
    )


def test_incremental_sink_redirects_resolve_stale_labels(spark, tmp_path):
    """Merges are recorded lazily in the redirect log; rows in
    untouched buckets keep stale labels on disk but the read view
    resolves them — across several merge generations."""
    from neo4j_graph_algorithms_spark import Graph, wcc

    sink = _sink_state(spark, tmp_path, "st2", n_buckets=4)
    batches = [
        [(1, 2), (3, 4), (10, 11), (20, 21)],
        [(2, 3)],                 # merge {1,2}+{3,4}
        [(11, 20)],               # merge {10,11}+{20,21}
        [(4, 10)],                # merge everything
        [(30, 31)],               # disjoint new component
    ]
    seen = []
    for i, b in enumerate(batches):
        seen += b
        sink(spark.createDataFrame(b, "src long, dst long"), i)
        full = wcc(Graph.from_edge_list(spark, seen)).components
        assert _comp_set(sink.components()) == _comp_set(
            full.select("id", "set_id")
        ), f"batch {i}"
    # redirect log is bounded by merges, and fully compressed: every
    # target is a live root (no entry's new_set appears as an old_set)
    man = sink.manifest()
    red = spark.read.parquet(
        str(tmp_path / "st2" / f"redirects_b{man['redirects']}")
    )
    rows = {(r["old_set"], r["new_set"]) for r in red.collect()}
    olds = {o for o, _ in rows}
    assert all(n not in olds for _, n in rows), rows


def test_incremental_sink_compaction_and_replay(spark, tmp_path):
    """max_redirects=0 forces the log to fold into the base relation
    every merge batch (compacted=True, all buckets rewritten, empty
    log) — and a replayed batch id rebuilds from the prior manifest and
    overwrites its own outputs idempotently."""
    from neo4j_graph_algorithms_spark import Graph, wcc

    sink = _sink_state(spark, tmp_path, "st3", n_buckets=4, max_redirects=0)
    sink(spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long"), 0)
    df1 = spark.createDataFrame([(2, 3)], "src long, dst long")
    sink(df1, 1)
    man = sink.manifest()
    assert man["metrics"]["compacted"] is True
    assert man["metrics"]["redirect_rows"] == 0
    before = _comp_set(sink.components())

    sink(df1, 1)  # replay
    assert _comp_set(sink.components()) == before
    full = wcc(
        Graph.from_edge_list(spark, [(1, 2), (3, 4), (2, 3)])
    ).components
    assert before == _comp_set(full.select("id", "set_id"))

    # on-disk rows are fully resolved after compaction (no redirects)
    base = sink.components(before_batch=None)
    assert _comp_set(base) == before

    removed = sink.vacuum()
    assert removed  # old versions dropped
    assert _comp_set(sink.components()) == before


def test_streaming_cms_sketch_equals_batch(spark, tmp_path):
    """The streaming CMS counters equal the batch sketch over the same
    corpus exactly (bounded depth*width state), and the estimates read
    off the sink match textstats.cms_term_counts."""
    from neo4j_graph_algorithms_spark.functions.textstats import (
        cms_bucket,
        cms_term_counts,
    )
    from neo4j_graph_algorithms_spark.streaming.edge_stream import (
        streaming_cms_sketch,
    )

    src = "/root/testdata/sf0.001/documents.parquet"
    stage = str(tmp_path / "docs_dir")
    spark.read.parquet(src).write.parquet(stage)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(stage)
    q = (
        streaming_cms_sketch(stream, depth=4, width=256)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_sketch")
        .start()
    )
    _drain(q)
    sketch = spark.sql("SELECT * FROM cms_sketch")
    assert sketch.count() <= 4 * 256  # bounded state
    # probe estimates off the streamed sketch == the batch CMS
    from neo4j_graph_algorithms_spark.functions.textstats import term_rows

    docs = spark.read.parquet(src)
    vocab = term_rows(docs).select("term").distinct()
    probes = vocab.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), cms_bucket(F.col("term"), j, 256).alias("b"))
                    for j in range(4)
                ]
            )
        ).alias("p"),
    ).select("term", F.col("p.j").alias("j"), F.col("p.b").alias("b"))
    streamed_est = {
        r["term"]: r["est"]
        for r in probes.join(F.broadcast(sketch), ["j", "b"])
        .groupBy("term")
        .agg(F.min("c").cast("long").alias("est"))
        .filter(F.col("est") >= 100)
        .collect()
    }
    batch_est = {
        r["term"]: r["est_count"]
        for r in cms_term_counts(docs, depth=4, width=256, min_estimate=100).collect()
    }
    assert streamed_est == batch_est


def test_streaming_fm_distinct_equals_batch(spark, tmp_path):
    """textstats.fm_distinct is a pure transform, so the SAME function
    runs on a streaming frame (bounded state: replicas longs per
    group) and its running estimates equal the batch estimates over
    the union of all micro-batches — sketches are mergeable."""
    from neo4j_graph_algorithms_spark.functions.textstats import (
        fm_distinct,
        tokens,
    )

    src = "/root/testdata/sf0.001/documents.parquet"
    stage = str(tmp_path / "docs_fm")
    spark.read.parquet(src).write.parquet(stage)
    schema = spark.read.parquet(src).schema

    def lang_terms(docs):
        # no join (stream-stream joins are append-mode-only): the lang
        # column rides the explode
        return docs.select(
            "lang", F.explode(tokens(F.col("text"))).alias("term")
        )

    stream = spark.readStream.schema(schema).parquet(stage)
    q = (
        fm_distinct(lang_terms(stream), "lang", "term", replicas=8)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("fm_stream")
        .start()
    )
    _drain(q)
    streamed = {
        r["lang"]: r["est_distinct"]
        for r in spark.sql("SELECT * FROM fm_stream").collect()
    }
    batch = {
        r["lang"]: r["est_distinct"]
        for r in fm_distinct(
            lang_terms(spark.read.parquet(src)), "lang", "term", replicas=8
        ).collect()
    }
    assert streamed == batch
