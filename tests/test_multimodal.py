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


def test_sample_frames_k_validation(spark):
    docs = spark.createDataFrame([(1, "abc")], ["doc_id", "text"])
    media = M.synthesize_media(docs, kind="video")
    with pytest.raises(ValueError):
        M.sample_frames(media, k=1)
