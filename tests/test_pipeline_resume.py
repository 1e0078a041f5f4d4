"""Checkpoint/resume + lineage metrics tests (north rule: resumable runs)."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark import datagen
from entityresolution_capstone_spark.plans.pipeline import Pipeline, PipelineConfig
from entityresolution_capstone_spark.sources import tables as TBL


@pytest.fixture(scope="module")
def small_corpus(spark):
    spec = datagen.CorpusSpec(n_entities=12, convs_per_entity=3, seed=3)
    return datagen.corpus_dataframes(spark, spec)


def test_resume_skips_committed_stages_and_matches(spark, small_corpus):
    transcripts, labels = small_corpus
    base = tempfile.mkdtemp(prefix="ercs_resume_")
    cfg = PipelineConfig(base_dir=base, similarity_threshold=0.8)
    p1 = Pipeline(spark, cfg)
    r1 = p1.run(transcripts)
    first = sorted(
        (r["conv_id"], r["cluster_id"])
        for r in spark.read.parquet(f"{base}/clusters").collect()
    )

    # simulate a crash after 'scores': wipe every later stage
    for stage in ("bootstrap_edges", "cluster_edges", "clusters"):
        shutil.rmtree(os.path.join(base, stage), ignore_errors=True)
    assert TBL.is_committed(os.path.join(base, "scores"))
    assert not TBL.is_committed(os.path.join(base, "clusters"))

    p2 = Pipeline(spark, cfg)
    r2 = p2.run(transcripts)
    second = sorted(
        (r["conv_id"], r["cluster_id"])
        for r in spark.read.parquet(f"{base}/clusters").collect()
    )
    assert first == second
    shutil.rmtree(base, ignore_errors=True)


def test_uncommitted_partial_write_is_ignored(spark, small_corpus):
    """A directory without the manifest is not 'committed' — resume redoes it."""
    transcripts, _ = small_corpus
    base = tempfile.mkdtemp(prefix="ercs_partial_")
    cfg = PipelineConfig(base_dir=base, similarity_threshold=0.8)
    Pipeline(spark, cfg).run(transcripts)
    # corrupt: delete the manifest of 'clusters' (simulates a torn write)
    os.remove(os.path.join(base, "clusters", TBL.MANIFEST))
    assert not TBL.is_committed(os.path.join(base, "clusters"))
    Pipeline(spark, cfg).run(transcripts)
    assert TBL.is_committed(os.path.join(base, "clusters"))
    shutil.rmtree(base, ignore_errors=True)


def test_lineage_metrics_written(spark, small_corpus):
    transcripts, _ = small_corpus
    base = tempfile.mkdtemp(prefix="ercs_metrics_")
    cfg = PipelineConfig(base_dir=base, similarity_threshold=0.8)
    p = Pipeline(spark, cfg)
    p.run(transcripts)
    m = spark.read.parquet(f"{base}/_metrics")
    stages = {r["stage"] for r in m.select("stage").distinct().collect()}
    for expected in ("docs", "blocks", "pairs", "scores", "clusters"):
        assert expected in stages, stages
    # per-partition lineage rows present with row counts
    docs_rows = m.filter(
        (F.col("stage") == "docs") & F.col("partition_id").isNotNull()
    )
    total = docs_rows.agg(F.sum("rows_out")).collect()[0][0]
    assert total == spark.read.parquet(f"{base}/docs").count()
    assert m.filter(F.col("run_id") == p.run_id).count() > 0
    shutil.rmtree(base, ignore_errors=True)
