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
