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
