"""Multimodal plumbing: schema, mapInPandas decode path, determinism."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    return M.synthesize_media(docs).cache()


def test_media_schema(media):
    # names + types must match the declared schema (nullability flags differ
    # between literal-built columns and the declared StructType)
    assert media.schema.simpleString() == M.MEDIA_SCHEMA.simpleString()


def test_decode_features_shape_and_determinism(spark, media):
    f1 = M.decode_media(media)
    assert f1.schema == M.FEATURES_SCHEMA
    rows = f1.collect()
    assert all(len(r["features"]) == M.FEATURE_DIM for r in rows)
    assert all(r["decoder"] == "stub" for r in rows)
    # deterministic across partitioning (no per-partition state leaks)
    f2 = {r["media_id"]: r["sha256"] for r in M.decode_media(media.repartition(7)).collect()}
    for r in rows:
        assert f2[r["media_id"]] == r["sha256"]


def test_identical_payloads_identical_features(spark, media):
    feats = M.decode_media(media)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    dup_groups = docs.groupBy("text").count().filter(F.col("count") > 1).count()
    distinct_shas = feats.select("sha256").distinct().count()
    distinct_texts = docs.select("text").distinct().count()
    assert distinct_shas == distinct_texts


def test_media_stats(media):
    stats = M.media_stats(M.decode_media(media)).collect()
    assert len(stats) == 1
    assert stats[0]["kind"] == "image"
    assert stats[0]["n"] == 100


def test_sample_frames_endpoints_and_dedupe(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(1, "x" * 350), (2, "short")], ["doc_id", "text"]
    )
    media = M.synthesize_media(docs, kind="video")
    rows = M.sample_frames(media, k=4, frame_chars=100).collect()
    by = {}
    for r in rows:
        by.setdefault(r["media_id"], {})[r["frame_idx"]] = r
    # doc 1: 350 chars -> 3 frames; k=4 endpoint-inclusive indices over
    # grid 0..2 -> {0, 0, 1, 2} deduped to {0, 1, 2}
    assert sorted(by[1]) == [0, 1, 2]
    assert by[1][0]["n_frames"] == 3
    assert by[1][2]["frame_sha"] == hashlib.sha256(("x" * 100).encode()).hexdigest()
    # doc 2: single frame -> one deduped row at idx 0
    assert sorted(by[2]) == [0]
    assert by[2][0]["frame_sha"] == hashlib.sha256(b"short").hexdigest()


def _make_wav_bytes(n_samples=800, rate=8000, width=2):
    """Tiny deterministic PCM WAV: a ramp that spends its first half quiet
    and its second half loud, so the energy-envelope bins are checkable."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(width)
        w.setframerate(rate)
        half = n_samples // 2
        samples = [0] * half + [16384] * (n_samples - half)
        w.writeframes(struct.pack(f"<{n_samples}h", *samples))
    return buf.getvalue()


def test_real_wav_decode(spark):
    """The audio kind decodes REAL bytes via the stdlib wave module: decoder
    column says 'real:wave' and the features are the true energy envelope
    (first half silent -> 0.0 bins, second half at half full-scale -> 0.5)."""
    wav = _make_wav_bytes()
    media = spark.createDataFrame(
        [(1, "audio", bytearray(wav), None)],
        schema=M.MEDIA_SCHEMA,
    )
    rows = M.decode_media(media).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["decoder"] == "real:wave"
    feats = r["features"]
    assert len(feats) == M.FEATURE_DIM
    half = M.FEATURE_DIM // 2
    assert all(abs(v) < 1e-6 for v in feats[:half])
    assert all(abs(v - 0.5) < 1e-3 for v in feats[half:])


def test_wav_decode_matches_local_kernel(spark):
    """Spark-side decode equals the local kernel on the same bytes (the
    mapInPandas plumbing adds nothing to the math)."""
    wav = _make_wav_bytes(n_samples=333)
    local_feats, name = M._decode_audio_real(wav)
    assert name == "real:wave"
    media = spark.createDataFrame(
        [(7, "audio", bytearray(wav), None)], schema=M.MEDIA_SCHEMA
    )
    row = M.decode_media(media).collect()[0]
    assert row["decoder"] == "real:wave"
    for got, want in zip(row["features"], local_feats):
        assert abs(got - float(want)) < 1e-6


def test_invalid_audio_falls_back_to_stub(spark):
    media = spark.createDataFrame(
        [(2, "audio", bytearray(b"not a wav at all"), None)],
        schema=M.MEDIA_SCHEMA,
    )
    rows = M.decode_media(media).collect()
    assert rows[0]["decoder"] == "stub"
    assert len(rows[0]["features"]) == M.FEATURE_DIM


def test_real_png_decode_when_pil_present(spark):
    """Import-gated PIL branch: decodes a real tiny PNG when PIL is
    installed (skipped in containers without it — the WAV test above keeps
    the real-decoder plumbing exercised everywhere)."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("L", (8, 8), color=128)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [(3, "image", bytearray(buf.getvalue()), None)],
        schema=M.MEDIA_SCHEMA,
    )
    rows = M.decode_media(media).collect()
    assert rows[0]["decoder"] == "real:PIL"
    assert all(abs(v - 0.5) < 0.01 for v in rows[0]["features"])


def test_sample_frames_k_validation(spark):
    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    media = M.synthesize_media(docs, kind="video")
    with pytest.raises(ValueError):
        M.sample_frames(media, k=1)
