"""Multimodal path: REAL BMP/PPM/WAV decoding through mapInPandas,
schema, failure semantics, decoder registry."""

import math
import struct

import pytest

from neo4j_graph_algorithms_spark.sources import multimodal as mm


def test_extract_features_real_decode_deterministic(spark):
    media = mm.synthetic_media(spark, n=50)
    a = {r["media_id"]: r for r in mm.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in mm.extract_features(media).collect()}
    assert {k: v["feature"] for k, v in a.items()} == b
    assert len(a) == 50
    for mid, r in a.items():
        assert r["decode_ok"], mid
        want = mm.IMAGE_FEATURE_DIM if mid % 2 == 0 else mm.AUDIO_FEATURE_DIM
        assert len(r["feature"]) == want, mid


def test_bmp_decode_exact_values():
    # constant-color image → thumbnail is exactly that gray everywhere
    w = h = 8
    row = (w * 3 + 3) & ~3
    px = (bytes((30, 20, 10)) * w + b"\x00" * (row - 3 * w)) * h  # BGR
    header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 0, 0, 0, 0)
    out = mm._image_decode(bytes(header + info) + px)
    gray = (10 + 20 + 30) / 3 / 255.0
    thumb, chans = out["feature"][:16], out["feature"][16:]
    assert all(x == pytest.approx(gray) for x in thumb)
    assert chans == pytest.approx([10 / 255, 20 / 255, 30 / 255])


def test_ppm_decode_matches_bmp_pixels():
    # same pixels via P6 → identical feature vector
    w = h = 4
    rgb = bytes((10, 20, 30)) * (w * h)
    ppm = b"P6\n# c\n4 4\n255\n" + rgb
    out = mm._image_decode(ppm)
    assert out["decode_ok"] and len(out["feature"]) == mm.IMAGE_FEATURE_DIM
    assert out["feature"][16:] == pytest.approx([10 / 255, 20 / 255, 30 / 255])


def test_wav_decode_rms_of_sine():
    data = mm.make_wav(seed=0, sample_rate=8000, ms=125)
    out = mm._audio_decode(data)
    assert out["decode_ok"] and out["frames"] == 1000
    # RMS of a full-window sine ≈ amplitude/sqrt(2)
    amp = 20000 / 32768.0
    for v in out["feature"]:
        assert v == pytest.approx(amp / math.sqrt(2), rel=0.05)


def test_garbage_bytes_mark_decode_failed(spark):
    import pandas as pd

    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1, 2],
                "kind": ["image", "audio"],
                "media": [b"\x00garbage", b"also-not-a-wav"],
                "mime": ["image/bmp", "audio/wav"],
                "width": [None, None],
                "height": [None, None],
                "duration_ms": [None, None],
                "sample_rate": [None, None],
            }
        ),
        schema=mm.MEDIA_SCHEMA,
    )
    out = mm.extract_features(media).collect()
    assert all((not r["decode_ok"]) and r["feature"] is None for r in out)


def test_video_decoder_unavailable_marks_failed(spark):
    media = mm.synthetic_media(spark, n=4).replace("image", "video", "kind")
    out = mm.extract_features(media).collect()
    vids = [r for r in out if r["kind"] == "video"]
    assert vids and all((not r["decode_ok"]) and r["feature"] is None for r in vids)


def test_frame_sample_plan(spark):
    media = mm.synthetic_media(spark, n=10)
    frames = mm.frame_sample(media, every_ms=25)
    rows = frames.collect()
    assert all(r["frame_ts_ms"] % 25 == 0 for r in rows)
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


def _has(mod):
    try:
        __import__(mod)
        return True
    except ImportError:
        return False


def test_register_optional_decoders_absent_is_noop(spark):
    """Without Pillow/soundfile the registration reports False per
    backend and the stdlib BMP/WAV pipeline keeps working unchanged."""
    before_img, before_aud = mm.DECODERS["image"], mm.DECODERS["audio"]
    try:
        got = mm.register_optional_decoders()
        assert set(got) == {"pillow", "soundfile"}
        assert got["pillow"] == _has("PIL")
        assert got["soundfile"] == _has("soundfile")
        out = mm.extract_features(mm.synthetic_media(spark, n=6)).collect()
        assert out and all(r["decode_ok"] for r in out)
    finally:
        mm.register_decoder("image", before_img)
        mm.register_decoder("audio", before_aud)


@pytest.mark.skipif(not _has("PIL"), reason="Pillow not installed")
def test_pillow_decoder_feature_parity_and_png():
    """Pillow-backed decode of the same BMP bytes yields the same
    feature vector as the stdlib decoder, and PNG (stdlib-unreadable)
    decodes once Pillow is registered."""
    import io as _io

    from PIL import Image

    before = mm.DECODERS["image"]
    try:
        got = mm.register_optional_decoders()
        assert got["pillow"]
        bmp = mm.make_bmp(3)
        std = before(bmp)
        pil = mm.DECODERS["image"](bmp)
        assert pil["decode_ok"] and std["decode_ok"]
        assert pil["feature"] == pytest.approx(std["feature"], abs=1e-9)
        # PNG: stdlib raises, Pillow path decodes the identical pixels
        with Image.open(_io.BytesIO(bmp)) as im:
            buf = _io.BytesIO()
            im.save(buf, format="PNG")
        png = buf.getvalue()
        with pytest.raises(ValueError):
            before(png)
        out = mm.DECODERS["image"](png)
        assert out["decode_ok"]
        assert out["feature"] == pytest.approx(std["feature"], abs=1e-9)
    finally:
        mm.register_decoder("image", before)


@pytest.mark.skipif(not _has("soundfile"), reason="soundfile not installed")
def test_soundfile_decoder_feature_parity():
    """soundfile-backed decode of the same PCM WAV matches the stdlib
    wave decoder's RMS feature windows."""
    before = mm.DECODERS["audio"]
    try:
        got = mm.register_optional_decoders()
        assert got["soundfile"]
        wav = mm.make_wav(5)
        std = before(wav)
        sf_ = mm.DECODERS["audio"](wav)
        assert sf_["decode_ok"] and sf_["frames"] == std["frames"]
        assert sf_["feature"] == pytest.approx(std["feature"], abs=1e-6)
    finally:
        mm.register_decoder("audio", before)


def test_make_bmp_div3_channel_sums_divisible():
    """The oracle-replicable BMP variant: every pixel's r+g+b ≡ 0 mod 3
    (the exactness precondition for the multimodal driver oracle), and
    the payload still decodes through the real BMP path."""
    out = mm._image_decode(mm.make_bmp_div3(7))
    assert out["decode_ok"] and out["frames"] == 1
    rgb = mm._decode_bmp(mm.make_bmp_div3(7)).astype(int)
    assert ((rgb.sum(axis=2) % 3) == 0).all()
    # gray block sums are exact integers => features are exact dyadic
    # rationals; spot-check one thumb cell against hand arithmetic
    gray = rgb.sum(axis=2) // 3
    want = (float(gray[:4, :4].sum()) / 16) / 255
    assert out["feature"][0] == want


def test_make_wav_int_decode_exact_rms():
    """Integer-arithmetic WAV: decoded samples replay the generator
    formula exactly and the first RMS window equals hand arithmetic."""
    data = mm.make_wav_int(3)
    out = mm._audio_decode(data)
    assert out["decode_ok"] and out["frames"] == 1000
    s = [((3 * 31 + i * 17) % 4001) - 2000 for i in range(1000)]
    acc = sum((v / 32768.0) * (v / 32768.0) for v in s[:63])
    assert out["feature"][0] == math.sqrt(acc / 63)
