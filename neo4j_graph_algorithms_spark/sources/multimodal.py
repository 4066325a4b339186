"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schemas, Arrow batch iteration,
partition-size control — while the actual codec work is stubbed behind
``DecoderRegistry`` (the image/audio libraries are not in this
container).  The stub decoders are *deterministic fakes* keyed on the
content bytes, so tests exercise the full distributed path (schema
evolution, batch shapes, metadata propagation) with reproducible
outputs; swap a real decoder in via ``register_decoder``.

Layout guidance baked in: media rows are large, so ``mapInPandas`` is
used (streaming per-batch iterator — bounded memory) rather than
``collect_list``-style grouping, and the repartition knob targets
``rows_per_task`` to keep task memory flat at 100 TB.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, media binary, mime string, "
    "width int, height int, duration_ms long, sample_rate int"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feature array<float>, frames int, decode_ok boolean"
)


def _fake_image_decode(data: bytes) -> dict:
    """Deterministic stand-in for a real image decoder.

    REAL DECODER GOES HERE (PIL/opencv): raise if unavailable so the
    stub is never mistaken for real output in production paths.
    """
    h = hashlib.sha256(data or b"").digest()
    return {
        "feature": [b / 255.0 for b in h[:16]],
        "frames": 1,
        "decode_ok": True,
    }


def _fake_audio_decode(data: bytes) -> dict:
    h = hashlib.sha256(b"audio:" + (data or b"")).digest()
    return {"feature": [b / 255.0 for b in h[:16]], "frames": len(data or b"") // 1024 + 1, "decode_ok": True}


def _unavailable(kind: str) -> Callable[[bytes], dict]:
    def _raise(data: bytes) -> dict:
        raise NotImplementedError(
            f"no real {kind} decoder available in this environment; "
            "register one with register_decoder(kind, fn) (e.g. PIL/ffmpeg-backed)"
        )

    return _raise


DECODERS: dict[str, Callable[[bytes], dict]] = {
    "image": _fake_image_decode,
    "audio": _fake_audio_decode,
    "video": _unavailable("video"),
}


def register_decoder(kind: str, fn: Callable[[bytes], dict]) -> None:
    DECODERS[kind] = fn


def synthetic_media(spark, n: int = 200, num_partitions: int = 8) -> DataFrame:
    """Deterministic fake media table with the standard schema."""
    df = spark.range(0, n, 1, num_partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio")), (F.col("id") % 2 + 1).cast("int")
    )
    payload = F.sha2(F.concat(F.lit("media"), F.col("id")), 512).cast("binary")
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        payload.alias("media"),
        F.when(F.col("id") % 2 == 0, F.lit("image/png")).otherwise(F.lit("audio/wav")).alias("mime"),
        F.when(F.col("id") % 2 == 0, F.lit(64)).otherwise(F.lit(None)).cast("int").alias("width"),
        F.when(F.col("id") % 2 == 0, F.lit(64)).otherwise(F.lit(None)).cast("int").alias("height"),
        F.when(F.col("id") % 2 == 1, (F.col("id") * 10 + 1000)).otherwise(F.lit(None)).cast("long").alias("duration_ms"),
        F.when(F.col("id") % 2 == 1, F.lit(16000)).otherwise(F.lit(None)).cast("int").alias("sample_rate"),
    )


def extract_features(
    media: DataFrame,
    rows_per_task: int | None = None,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` — batch iterator in,
    batch iterator out, so a partition of large blobs never needs to be
    resident at once."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, frames, oks = [], [], []
            for kind, data in zip(pdf["kind"], pdf["media"]):
                dec = DECODERS.get(kind)
                if dec is None:
                    feats.append(None), frames.append(0), oks.append(False)
                    continue
                try:
                    out = dec(bytes(data) if data is not None else b"")
                    feats.append(out["feature"])
                    frames.append(out["frames"])
                    oks.append(out["decode_ok"])
                except NotImplementedError:
                    feats.append(None)
                    frames.append(0)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "frames": frames,
                    "decode_ok": oks,
                }
            )

    src = media
    if rows_per_task:
        n = max(1, media.count() // rows_per_task)
        src = media.repartition(n)
    return src.mapInPandas(_run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp.
    The decode itself is stubbed (no codec in-container) but the
    explode/partition shape — the scale-relevant part — is real."""
    ts = F.sequence(
        F.lit(0),
        F.coalesce(F.col("duration_ms"), F.lit(0)).cast("long"),
        F.lit(int(every_ms)),
    )
    return media.filter(F.col("duration_ms").isNotNull()).select(
        "media_id", "kind", F.explode(ts).alias("frame_ts_ms")
    )
