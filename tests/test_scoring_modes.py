"""Scoring configurations beyond the default path: soft-TF-IDF kernel weights,
relational mix-in (alpha > 0), and the jaccard kernel."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark import datagen
from entityresolution_capstone_spark.functions import relational as R
from entityresolution_capstone_spark.functions.tfidf import doc_frequencies
from entityresolution_capstone_spark.operators import blocking as B
from entityresolution_capstone_spark.operators import scoring as SC
from entityresolution_capstone_spark.operators.canonicalize import canonical_docs


@pytest.fixture(scope="module")
def small(spark):
    spec = datagen.CorpusSpec(n_entities=8, convs_per_entity=3, seed=41)
    transcripts, labels = datagen.corpus_dataframes(spark, spec)
    docs = canonical_docs(transcripts).persist()
    dft = doc_frequencies(docs).persist()
    tdict = B.token_dictionary(dft)
    cfg = B.BlockingConfig()
    pairs = B.candidate_pairs(B.build_blocks(docs, tdict, cfg), cfg).persist()
    return docs, dft, pairs, labels


def test_stfidf_scoring_path(spark, small):
    docs, dft, pairs, _ = small
    scored = SC.score_pairs(
        pairs.limit(50),
        docs,
        SC.ScoringConfig(weights={"stfidf": 1.0}),
        df_table=dft,
        corpus_size=docs.count(),
        spark=spark,
    )
    rows = scored.collect()
    # soft-TF-IDF is NOT bounded by 1: the similarity map may pair a token
    # with a different, higher-idf token, exceeding the plain-cosine bound
    # (py_stringmatching behaves the same way). Identical docs score ~1.
    assert all(0.0 <= r["stfidf"] < 2.0 for r in rows)
    assert all(r["sim"] == r["attr_sim"] for r in rows)


def test_jaccard_kernel_path(spark, small):
    docs, dft, pairs, _ = small
    scored = SC.score_pairs(
        pairs.limit(50), docs, SC.ScoringConfig(weights={"jaccard": 1.0})
    )
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in scored.collect())


def test_alpha_relational_mix(spark, small):
    """sim = (1-α)·attr + α·rel (resolver.py:970-986)."""
    docs, dft, pairs, _ = small
    # co-occurrence edges: consecutive convs share a hyper-edge
    ids = [r["conv_id"] for r in docs.select("conv_id").orderBy("conv_id").collect()]
    edges = spark.createDataFrame(
        [(cid, i // 2) for i, cid in enumerate(ids)], ["conv_id", "edge_id"]
    )
    clusters = docs.select("conv_id", F.col("conv_id").alias("cluster_id"))
    nbrs = R.cluster_neighbors(clusters, edges)
    p = pairs.limit(30)
    rel = R.rel_sim_pairs(
        p.select(F.col("id1").alias("c1"), F.col("id2").alias("c2")),
        nbrs,
        "jaccard_coef",
    )
    scored = SC.score_pairs(
        p,
        docs,
        SC.ScoringConfig(weights={"lev": 1.0}, alpha=0.5),
        rel_scores=rel,
    )
    rel_map = {
        (r["c1"], r["c2"]): r["rel_sim"] for r in rel.collect()
    }
    rows = scored.collect()
    assert rows
    for r in rows:
        expected = 0.5 * r["attr_sim"] + 0.5 * rel_map.get((r["id1"], r["id2"]), 0.0)
        assert r["sim"] == pytest.approx(expected, abs=1e-9)


def test_weights_must_sum_to_one():
    with pytest.raises(ValueError):
        SC.ScoringConfig(weights={"jw": 0.5, "lev": 0.2})


def test_slim_matches_detailed_attr_sim(spark, small):
    """score_pairs_slim (incl. the dense small-vocab tf-idf path) must equal
    score_pairs' attr_sim."""
    docs, dft, pairs, _ = small
    cfg = SC.ScoringConfig(weights={"jw": 0.3, "lev": 0.2, "tfidf": 0.5})
    n = docs.count()
    detailed = SC.score_pairs(pairs, docs, cfg, df_table=dft, corpus_size=n)
    slim = SC.score_pairs_slim(pairs, docs, cfg, df_table=dft, corpus_size=n)
    a = {(r["id1"], r["id2"]): r["attr_sim"] for r in detailed.collect()}
    b = {(r["id1"], r["id2"]): r["attr_sim"] for r in slim.collect()}
    assert set(a) == set(b)
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k


def test_slim_tfidf_only_keeps_all_pairs(spark):
    """tfidf-only weights: pairs with NO shared token (cosine 0) must still
    appear in score_pairs_slim output with attr_sim 0.0 (ADVICE fix: the
    sparse dot-product inner join used to drop them)."""
    from pyspark.sql import functions as F

    from entityresolution_capstone_spark.functions.tfidf import doc_frequencies
    from entityresolution_capstone_spark.operators.scoring import (
        ScoringConfig,
        score_pairs_slim,
    )

    docs = spark.createDataFrame(
        [
            ("c1", "alpha beta", ["alpha", "beta"]),
            ("c2", "alpha gamma", ["alpha", "gamma"]),
            ("c3", "delta", ["delta"]),
            ("c4", "", []),  # token-less doc
        ],
        "conv_id string, doc_prefix string, tokens array<string>",
    )
    pairs = spark.createDataFrame(
        [("c1", "c2"), ("c1", "c3"), ("c3", "c4")], "id1 string, id2 string"
    )
    dft = doc_frequencies(docs)
    out = score_pairs_slim(
        pairs, docs, ScoringConfig(weights={"tfidf": 1.0}),
        df_table=dft, corpus_size=4,
    )
    rows = {(r["id1"], r["id2"]): r["attr_sim"] for r in out.collect()}
    assert set(rows) == {("c1", "c2"), ("c1", "c3"), ("c3", "c4")}
    assert rows[("c1", "c3")] == 0.0 and rows[("c3", "c4")] == 0.0
    assert rows[("c1", "c2")] > 0.0


def test_stfidf_vocab_cap_falls_back_to_distributed(spark):
    """Above stfidf_max_vocab, score_pairs switches to the fully distributed
    soft-TF-IDF plan (functions/tfidf.py:soft_tfidf_pairs) instead of the
    driver-broadcast dict — scores must be identical either way (r3: the cap
    no longer refuses, it reroutes)."""
    from entityresolution_capstone_spark.functions.tfidf import doc_frequencies
    from entityresolution_capstone_spark.operators.scoring import (
        ScoringConfig,
        score_pairs,
    )

    docs = spark.createDataFrame(
        [
            ("c%d" % i, "tok%d sharedx" % i, ["tok%d" % i, "sharedx"])
            for i in range(30)
        ],
        "conv_id string, doc_prefix string, tokens array<string>",
    )
    pairs = spark.createDataFrame(
        [("c%d" % i, "c%d" % (i + 1)) for i in range(29)], "id1 string, id2 string"
    )
    dft = doc_frequencies(docs)

    def scores(cap):
        cfg = ScoringConfig(weights={"stfidf": 1.0}, stfidf_max_vocab=cap)
        out = score_pairs(pairs, docs, cfg, df_table=dft, corpus_size=30, spark=spark)
        return {(r["id1"], r["id2"]): r["attr_sim"] for r in out.collect()}

    broadcast_path = scores(10_000)  # vocab (31 tokens) fits → dict broadcast
    distributed_path = scores(10)  # vocab exceeds cap → distributed fallback
    assert set(broadcast_path) == set(distributed_path) and broadcast_path
    for k in broadcast_path:
        assert abs(broadcast_path[k] - distributed_path[k]) < 1e-12, k


def test_stfidf_byte_cap_falls_back_to_distributed(spark):
    """VERDICT r4 item 6: the driver dict is also capped in BYTES, not just
    rows — a small row count of long tokens must reroute to the distributed
    soft_tfidf_pairs plan, with identical scores."""
    from entityresolution_capstone_spark.functions.tfidf import doc_frequencies
    from entityresolution_capstone_spark.operators.scoring import (
        ScoringConfig,
        score_pairs,
    )

    # ~30 distinct tokens of ~40 chars: far under any row cap, ~5 KB of chars
    docs = spark.createDataFrame(
        [
            ("c%d" % i, "t", ["longtoken%04d" % i + "x" * 30, "shared" + "y" * 30])
            for i in range(30)
        ],
        "conv_id string, doc_prefix string, tokens array<string>",
    )
    pairs = spark.createDataFrame(
        [("c%d" % i, "c%d" % (i + 1)) for i in range(29)], "id1 string, id2 string"
    )
    dft = doc_frequencies(docs)

    def scores(byte_cap):
        cfg = ScoringConfig(
            weights={"stfidf": 1.0}, stfidf_max_vocab_bytes=byte_cap
        )
        out = score_pairs(pairs, docs, cfg, df_table=dft, corpus_size=30, spark=spark)
        return {(r["id1"], r["id2"]): r["attr_sim"] for r in out.collect()}

    # 64 MB default: dict path. 1 KB: 31 entries × (104 B + ~42 chars) ≈ 4.5 KB
    # estimate exceeds the cap → must reroute to the distributed plan.
    dict_path = scores(64 << 20)
    rerouted = scores(1 << 10)
    assert set(dict_path) == set(rerouted) and dict_path
    for k in dict_path:
        assert abs(dict_path[k] - rerouted[k]) < 1e-12, k


def test_dense_table_precompute_parity(spark, small):
    """score_pairs_slim with a caller-precomputed dense_table must be
    bit-identical to the inline dense path (bench.py materializes the
    per-doc featurization once in q_block and reuses it across scoring
    passes — the output may not depend on who derived the table)."""
    docs, dft, pairs, _ = small
    n_docs = docs.count()
    cfg = SC.ScoringConfig(weights={"jw": 0.3, "lev": 0.2, "tfidf": 0.5})

    inline = SC.score_pairs_slim(
        pairs, docs, cfg, df_table=dft, corpus_size=n_docs
    )
    dense = SC.precompute_dense_tfidf(docs, dft, n_docs)
    assert dense is not None  # tiny corpus must take the dense path
    pre = SC.score_pairs_slim(
        pairs, docs, cfg, df_table=dft, corpus_size=n_docs,
        dense_table=dense.persist(),
    )
    a = {(r["id1"], r["id2"]): r["attr_sim"] for r in inline.collect()}
    b = {(r["id1"], r["id2"]): r["attr_sim"] for r in pre.collect()}
    assert a == b and a


def test_force_sparse_tfidf_env_matches_dense_path(spark, small, monkeypatch):
    """SPARK_GRAFT_FORCE_SPARSE_TFIDF=1 (the cross-scale fixed-plan knob)
    must produce the same scores as the dense path it disables — the sparse
    explode+join route is the only plan available at real-corpus
    vocabularies, so its parity is the 100-TB-relevant correctness fact."""
    docs, dft, pairs, _ = small
    cfg = SC.ScoringConfig(weights={"jw": 0.3, "lev": 0.2, "tfidf": 0.5})
    n = docs.count()
    monkeypatch.delenv("SPARK_GRAFT_FORCE_SPARSE_TFIDF", raising=False)
    assert SC._dense_path_eligible(dft.count(), n)  # dense is the baseline
    dense = SC.score_pairs_slim(pairs, docs, cfg, df_table=dft, corpus_size=n)
    a = {(r["id1"], r["id2"]): r["attr_sim"] for r in dense.collect()}
    monkeypatch.setenv("SPARK_GRAFT_FORCE_SPARSE_TFIDF", "1")
    assert not SC._dense_path_eligible(dft.count(), n)
    sparse = SC.score_pairs_slim(pairs, docs, cfg, df_table=dft, corpus_size=n)
    b = {(r["id1"], r["id2"]): r["attr_sim"] for r in sparse.collect()}
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k


def test_tfidf_hot_cold_split_matches_plain_sparse(spark, small, monkeypatch):
    """r6 hot/cold token split: the sparse route with the hottest tokens
    scored as dense mini-vectors (static dot) + tail tokens in the explode
    join must equal the single explode join — the shared tokens are
    partitioned between the two sums, so only FP association can differ."""
    docs, dft, pairs, _ = small
    cfg = SC.ScoringConfig(weights={"jw": 0.3, "lev": 0.2, "tfidf": 0.5})
    n = docs.count()
    monkeypatch.setenv("SPARK_GRAFT_FORCE_SPARSE_TFIDF", "1")
    monkeypatch.setenv("SPARK_GRAFT_TFIDF_HOT_SPLIT", "1")
    split = SC.score_pairs_slim(pairs, docs, cfg, df_table=dft, corpus_size=n)
    a = {(r["id1"], r["id2"]): r["attr_sim"] for r in split.collect()}
    monkeypatch.setenv("SPARK_GRAFT_TFIDF_HOT_SPLIT", "0")
    plain = SC.score_pairs_slim(pairs, docs, cfg, df_table=dft, corpus_size=n)
    b = {(r["id1"], r["id2"]): r["attr_sim"] for r in plain.collect()}
    assert set(a) == set(b) and len(a) > 0
    for k in a:
        assert abs(a[k] - b[k]) < 1e-9, k

    # tfidf-only (no char kernels): the pair-restore path must also agree
    cfg2 = SC.ScoringConfig(weights={"tfidf": 1.0})
    monkeypatch.setenv("SPARK_GRAFT_TFIDF_HOT_SPLIT", "1")
    s2 = SC.score_pairs_slim(pairs, docs, cfg2, df_table=dft, corpus_size=n)
    a2 = {(r["id1"], r["id2"]): r["attr_sim"] for r in s2.collect()}
    monkeypatch.setenv("SPARK_GRAFT_TFIDF_HOT_SPLIT", "0")
    p2 = SC.score_pairs_slim(pairs, docs, cfg2, df_table=dft, corpus_size=n)
    b2 = {(r["id1"], r["id2"]): r["attr_sim"] for r in p2.collect()}
    assert set(a2) == set(b2) and len(a2) > 0
    for k in a2:
        assert abs(a2[k] - b2[k]) < 1e-9, k
