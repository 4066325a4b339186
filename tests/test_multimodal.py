"""Multimodal plumbing: schema, mapInPandas batch shape, stub decoders."""

import pytest

from neo4j_graph_algorithms_spark.sources import multimodal as mm


def test_extract_features_stub_deterministic(spark):
    media = mm.synthetic_media(spark, n=50)
    a = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert a == b
    assert len(a) == 50
    assert all(len(v) == 16 for v in a.values())


def test_video_decoder_unavailable_marks_failed(spark):
    media = mm.synthetic_media(spark, n=4).replace("image", "video", "kind")
    out = mm.extract_features(media).collect()
    vids = [r for r in out if r["kind"] == "video"]
    assert vids and all((not r["decode_ok"]) and r["feature"] is None for r in vids)


def test_frame_sample_plan(spark):
    media = mm.synthetic_media(spark, n=10)
    frames = mm.frame_sample(media, every_ms=500)
    rows = frames.collect()
    assert all(r["frame_ts_ms"] % 500 == 0 for r in rows)
    # only audio rows (odd ids) carry duration in the synthetic table
    assert {r["media_id"] % 2 for r in rows} == {1}


def test_register_custom_decoder(spark):
    media = mm.synthetic_media(spark, n=4).replace("image", "video", "kind")
    mm.register_decoder("video", lambda data: {"feature": [1.0], "frames": 7, "decode_ok": True})
    try:
        out = [r for r in mm.extract_features(media).collect() if r["kind"] == "video"]
        assert out and all(r["decode_ok"] and r["frames"] == 7 for r in out)
    finally:
        mm.register_decoder("video", mm._unavailable("video"))
