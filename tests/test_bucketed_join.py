"""Bucketed-table co-located join: bucketed sides join with no shuffle."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark import datagen
from entityresolution_capstone_spark.operators.canonicalize import canonical_docs
from entityresolution_capstone_spark.sources.tables import write_bucketed_table


def test_bucketed_join_has_no_exchange(spark):
    spec = datagen.CorpusSpec(n_entities=10, convs_per_entity=2, seed=31)
    transcripts, labels = datagen.corpus_dataframes(spark, spec)
    docs = canonical_docs(transcripts).select("conv_id", "doc")

    write_bucketed_table(docs, "ercs_docs_b", "conv_id", 4)
    write_bucketed_table(labels, "ercs_labels_b", "conv_id", 4)

    a = spark.table("ercs_docs_b")
    b = spark.table("ercs_labels_b")
    joined = a.join(b, "conv_id")
    # disable broadcast so the join strategy decision is about co-location
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("drop table if exists ercs_docs_b")
        spark.sql("drop table if exists ercs_labels_b")
