"""Decontamination operator: planted n-gram overlap against a benchmark set."""

from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators.decontam import decontaminate


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_planted(spark):
    # bench doc: 6 tokens -> 4 distinct 3-grams
    bench = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    docs = _docs(
        spark,
        [
            # full copy -> overlap 4 with the single bench doc
            (1, "alpha beta gamma delta epsilon zeta"),
            # shares exactly 2 grams ("beta gamma delta", "gamma delta epsilon")
            (2, "beta gamma delta epsilon interloper text here"),
            # shares exactly 1 gram -> below min_hits, NOT contaminated
            (3, "alpha beta gamma unrelated words following along"),
            # no overlap at all
            (4, "completely different content with no shared phrases"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=3, min_hits=2).collect()
    }
    assert out[1]["max_overlap"] == 4 and out[1]["contaminated"]
    assert out[1]["n_bench_hit"] == 1
    assert out[2]["max_overlap"] == 2 and out[2]["contaminated"]
    assert out[3]["max_overlap"] == 1 and not out[3]["contaminated"]
    assert out[3]["n_bench_hit"] == 0
    assert out[4]["max_overlap"] == 0 and not out[4]["contaminated"]
    # n_grams = distinct 3-grams (doc 4: 7 tokens -> 5 grams)
    assert out[4]["n_grams"] == 5


def test_decontaminate_pairwise_not_global(spark):
    """One stray gram shared with EACH of two bench docs is not contamination;
    min_hits grams shared with ONE bench doc is."""
    bench = _docs(
        spark,
        [
            (100, "red orange yellow green blue indigo"),
            (101, "one two three four five six"),
        ],
    )
    docs = _docs(
        spark,
        [
            # 1 gram from each bench doc (scattered) -> max_overlap 1
            (1, "red orange yellow stop one two three stop"),
            # 2 grams from bench 101 only
            (2, "one two three four stop stop stop"),
        ],
    )
    out = {
        r["doc_id"]: r
        for r in decontaminate(docs, bench, n=3, min_hits=2).collect()
    }
    assert out[1]["max_overlap"] == 1 and not out[1]["contaminated"]
    assert out[2]["max_overlap"] == 2 and out[2]["contaminated"]
    assert out[2]["n_bench_hit"] == 1


def test_decontaminate_short_docs_and_plan(spark):
    """Docs shorter than n use the whole token list as one gram; the bench
    side is broadcast (no corpus self-join / sort-merge on the corpus)."""
    bench = _docs(spark, [(100, "tiny doc")])
    docs = _docs(spark, [(1, "tiny doc"), (2, "other text")])
    res = decontaminate(docs, bench, n=3, min_hits=1)
    out = {r["doc_id"]: r for r in res.collect()}
    assert out[1]["max_overlap"] == 1 and out[1]["contaminated"]
    assert out[2]["max_overlap"] == 0
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_decontaminate_argmax_and_threshold(spark):
    from entityresolution_capstone_spark.operators.decontam import (
        semantic_decontaminate,
    )

    bench = _vecs(spark, [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])])
    corpus = _vecs(
        spark,
        [
            (1, [2.0, 0.0, 0.0]),   # cos 1.0 with bench 100
            (2, [1.0, 1.0, 0.0]),   # cos ~0.70711 with BOTH -> tie, lowest bid
            (3, [0.0, 0.0, 5.0]),   # orthogonal to both -> cos 0
            (4, [0.0, 0.0, 0.0]),   # zero vector -> cos 0 by contract
        ],
    )
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(corpus, bench, dim=3, threshold=0.5).collect()
    }
    assert out[1]["best_bench_id"] == 100 and out[1]["cosine"] == 1.0
    assert out[1]["contaminated"]
    # tie on rounded cosine -> lowest bench id wins
    assert out[2]["best_bench_id"] == 100 and abs(out[2]["cosine"] - 0.70711) < 1e-9
    assert out[2]["contaminated"]
    assert out[3]["cosine"] == 0.0 and not out[3]["contaminated"]
    assert out[4]["cosine"] == 0.0 and not out[4]["contaminated"]


def test_semantic_decontaminate_bench_is_broadcast(spark):
    from entityresolution_capstone_spark.operators.decontam import (
        semantic_decontaminate,
    )

    bench = _vecs(spark, [(9, [1.0, 2.0])])
    corpus = _vecs(spark, [(1, [2.0, 1.0]), (2, [3.0, 0.0])])
    res = semantic_decontaminate(corpus, bench, dim=2, threshold=0.9)
    plan = res._jdf.queryExecution().executedPlan().toString()
    # the eval side must ride a broadcast, never a shuffle/cartesian on C x E
    assert "Broadcast" in plan and "CartesianProduct" not in plan


def test_semantic_decontaminate_empty_benchmark_keeps_corpus(spark):
    from entityresolution_capstone_spark.operators.decontam import (
        semantic_decontaminate,
    )

    bench = _vecs(spark, []).filter("vec_id is not null")  # empty, same schema
    corpus = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    out = {
        r["vec_id"]: r
        for r in semantic_decontaminate(corpus, bench, dim=2, threshold=0.5).collect()
    }
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["best_bench_id"] is None
        assert r["cosine"] == 0.0 and not r["contaminated"]


def test_semantic_decontaminate_rejects_non_numeric_bench_id(spark):
    import pytest as _pytest

    from entityresolution_capstone_spark.operators.decontam import (
        semantic_decontaminate,
    )

    bench = spark.createDataFrame(
        [("a", [1.0, 0.0])], "vec_id string, embedding array<float>"
    )
    corpus = _vecs(spark, [(1, [1.0, 0.0])])
    with _pytest.raises(ValueError, match="must be numeric"):
        semantic_decontaminate(corpus, bench, dim=2)
