"""Streaming ingest: availableNow backfill + incremental canonicalization."""

import os
import shutil
import tempfile

import pytest

from entityresolution_capstone_spark import datagen, schemas
from entityresolution_capstone_spark.operators.canonicalize import canonical_docs
from entityresolution_capstone_spark.streaming.ingest import start_ingest


def test_stream_backfill_matches_batch(spark):
    spec = datagen.CorpusSpec(n_entities=6, convs_per_entity=2, seed=17)
    transcripts, _ = datagen.corpus_dataframes(spark, spec)

    base = tempfile.mkdtemp(prefix="ercs_stream_")
    input_dir = os.path.join(base, "in")
    transcripts.write.mode("overwrite").parquet(input_dir)

    q = start_ingest(
        spark,
        input_dir=input_dir,
        staging_dir=os.path.join(base, "staging"),
        docs_dir=os.path.join(base, "docs"),
        checkpoint_dir=os.path.join(base, "ckpt"),
        available_now=True,
    )
    q.awaitTermination(180)

    got = sorted(
        (r["conv_id"], r["doc"])
        for r in spark.read.parquet(os.path.join(base, "docs"))
        .select("conv_id", "doc")
        .collect()
    )
    want = sorted(
        (r["conv_id"], r["doc"])
        for r in canonical_docs(transcripts).select("conv_id", "doc").collect()
    )
    assert got == want
    shutil.rmtree(base, ignore_errors=True)


def test_stateful_turn_counts_across_restarts(spark):
    """State survives a query restart (checkpointed) and final counts match
    the batch aggregation."""
    import os, shutil, tempfile
    from pyspark.sql import functions as F

    from entityresolution_capstone_spark import schemas
    from entityresolution_capstone_spark.streaming.ingest import stateful_turn_counts

    spec = datagen.CorpusSpec(n_entities=4, convs_per_entity=2, seed=19)
    t_pd, _ = datagen.generate_corpus(spec)
    half = len(t_pd) // 2
    base = tempfile.mkdtemp(prefix="ercs_state_")
    in_dir, out_dir, ckpt = (os.path.join(base, d) for d in ("in", "out", "ckpt"))
    os.makedirs(in_dir)

    def run_once():
        stream = spark.readStream.schema(schemas.TRANSCRIPTS).parquet(in_dir)
        q = (
            stateful_turn_counts(stream)
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    spark.createDataFrame(t_pd.iloc[:half], schema=schemas.TRANSCRIPTS).write.mode(
        "append"
    ).parquet(in_dir)
    run_once()
    spark.createDataFrame(t_pd.iloc[half:], schema=schemas.TRANSCRIPTS).write.mode(
        "append"
    ).parquet(in_dir)
    run_once()

    out = spark.read.parquet(out_dir)
    # latest emitted row per conv = final state
    latest = (
        out.groupBy("conv_id").agg(F.max("n_turns").alias("n_turns"))
    )
    got = {r["conv_id"]: r["n_turns"] for r in latest.collect()}
    want = t_pd.groupby("conv_id").size().to_dict()
    assert got == want
    shutil.rmtree(base, ignore_errors=True)
