"""Canonical-doc materialization: ordering + the per-turn text-equality invariant."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark import datagen
from entityresolution_capstone_spark.operators.canonicalize import (
    canonical_docs,
    explode_docs_to_turns,
    ordered_turns,
)


@pytest.fixture(scope="module")
def corpus(spark):
    spec = datagen.CorpusSpec(n_entities=10, convs_per_entity=3, seed=11)
    return datagen.corpus_dataframes(spark, spec)


def test_doc_is_turnidx_ordered(spark):
    rows = [
        ("c1", 2, "user", "third", "", None),
        ("c1", 0, "user", "first", "", None),
        ("c1", 1, "assistant", "second", "", None),
        ("c2", 0, "user", "only", "", None),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    got = {r["conv_id"]: r["doc"] for r in canonical_docs(t).collect()}
    assert got["c1"] == "first second third"
    assert got["c2"] == "only"


def test_per_turn_text_equality_invariant(corpus, spark):
    """Exploding canonical docs back to turns reproduces transcripts.text
    exactly under turn_idx order (BASELINE.json input_hint invariant)."""
    transcripts, _ = corpus
    docs = canonical_docs(transcripts, keep_turns=True)
    back = explode_docs_to_turns(docs).select("conv_id", "turn_idx", "text")
    orig = transcripts.select("conv_id", "turn_idx", "text")
    assert back.exceptAll(orig).count() == 0
    assert orig.exceptAll(back).count() == 0


def test_ordered_turns_window_rank(corpus):
    transcripts, _ = corpus
    ot = ordered_turns(transcripts)
    bad = ot.filter(F.col("turn_rank") != F.col("turn_idx")).count()
    assert bad == 0  # datagen emits dense 0-based turn_idx


def test_tokens_match_doc_tokenization(corpus, spark):
    transcripts, _ = corpus
    docs = canonical_docs(transcripts)
    from entityresolution_capstone_spark.functions.text import tokenize

    bad = docs.filter(tokenize(F.col("doc")) != F.col("tokens")).count()
    assert bad == 0
