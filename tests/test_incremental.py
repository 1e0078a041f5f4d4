"""Incremental attach-to-catalog resolution (operators/incremental.py)."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.functions.text import tokenize
from entityresolution_capstone_spark.operators import blocking as B
from entityresolution_capstone_spark.operators.incremental import (
    attach_to_clusters,
    cross_candidate_pairs,
)
from entityresolution_capstone_spark.operators.scoring import ScoringConfig

CFG = B.BlockingConfig(
    use_token_keys=True,
    max_token_df=10,
    use_minhash=True,
    minhash_rows=2,
    minhash_bands=4,
    max_block_size=50,
)
SCORING = ScoringConfig(weights={"lev": 0.4, "tfidf": 0.6}, prefix_len=64)


def mk_docs(spark, rows):
    return spark.createDataFrame(rows, "conv_id string, doc string").select(
        "conv_id",
        "doc",
        F.substring("doc", 1, 64).alias("doc_prefix"),
        tokenize(F.col("doc")).alias("tokens"),
    )


@pytest.fixture(scope="module")
def corpora(spark):
    base = mk_docs(
        spark,
        [
            ("b1", "johnson quarterly revenue report for the northwest region"),
            ("b2", "johnson quarterly revenue report for the northwest territory"),
            ("b3", "recipe for sourdough bread with long fermentation"),
            ("b4", "annual shareholder meeting minutes acme corporation board"),
        ],
    )
    clusters = spark.createDataFrame(
        [("b1", "c_rev"), ("b2", "c_rev"), ("b3", "c_bread"), ("b4", "c_acme")],
        "conv_id string, cluster_id string",
    )
    new = mk_docs(
        spark,
        [
            # exact copy of b1 -> attach to c_rev with sim 1.0
            ("n1", "johnson quarterly revenue report for the northwest region"),
            # near copy of b3 -> attach to c_bread
            ("n2", "recipe for sourdough bread with very long fermentation"),
            # unrelated -> singleton
            ("n3", "migratory patterns of arctic terns across two hemispheres"),
        ],
    )
    return base, clusters, new


def test_attach_basic(spark, corpora):
    base, clusters, new = corpora
    out = {
        r["conv_id"]: r
        for r in attach_to_clusters(
            new, base, clusters, CFG, SCORING, threshold=0.8
        ).collect()
    }
    assert set(out) == {"n1", "n2", "n3"}
    assert out["n1"]["cluster_id"] == "c_rev"
    assert out["n1"]["best_sim"] == 1.0
    assert out["n2"]["cluster_id"] == "c_bread"
    assert out["n2"]["best_sim"] >= 0.8
    # unrelated doc: singleton keyed by its own id, zero score
    assert out["n3"]["cluster_id"] == "n3"
    assert out["n3"]["best_sim"] == 0.0


def test_attach_tie_breaks_to_min_cluster(spark, corpora):
    """Two base docs with IDENTICAL text but different prior clusters: the
    new exact copy ties at sim 1.0 on both -> deterministic min cluster_id,
    and never merges the two existing clusters."""
    base = mk_docs(
        spark,
        [
            ("b1", "identical text for the tie break case"),
            ("b2", "identical text for the tie break case"),
        ],
    )
    clusters = spark.createDataFrame(
        [("b1", "c_z"), ("b2", "c_a")], "conv_id string, cluster_id string"
    )
    new = mk_docs(spark, [("n1", "identical text for the tie break case")])
    out = attach_to_clusters(new, base, clusters, CFG, SCORING, 0.8).collect()
    assert len(out) == 1
    assert out[0]["cluster_id"] == "c_a"  # min cluster_id among tied scores
    assert out[0]["n_cand"] == 2


def test_linkage_avg_vs_max(spark, corpora):
    """avg linkage drags the cluster score down when the cluster also holds a
    weaker member; max linkage ignores it."""
    base = mk_docs(
        spark,
        [
            ("b1", "shared vocabulary alpha beta gamma delta epsilon zeta"),
            ("b2", "shared vocabulary alpha beta gamma delta unrelated tail words here"),
        ],
    )
    clusters = spark.createDataFrame(
        [("b1", "c1"), ("b2", "c1")], "conv_id string, cluster_id string"
    )
    new = mk_docs(spark, [("n1", "shared vocabulary alpha beta gamma delta epsilon zeta")])
    hi = attach_to_clusters(new, base, clusters, CFG, SCORING, 0.0, "max").collect()[0]
    lo = attach_to_clusters(new, base, clusters, CFG, SCORING, 0.0, "avg").collect()[0]
    assert hi["best_sim"] == 1.0
    assert lo["best_sim"] < hi["best_sim"]
    assert lo["cluster_id"] == hi["cluster_id"] == "c1"


def test_cross_pairs_equal_union_restriction(spark):
    """cross_candidate_pairs == candidate_pairs(union) restricted to
    cross-side pairs — same dictionary, same union-wide block cap, same
    min-common-key dedupe."""
    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta zeta",
        "alpha beta gamma eta theta",
        "iota kappa lambda mu nu",
        "iota kappa lambda mu xi",
        "omicron pi rho sigma tau",
    ]
    rows = [(f"d{i}", t) for i, t in enumerate(texts)]
    new_rows, base_rows = rows[:3], rows[3:]
    # overlap: one new doc is also near a base doc
    new_rows = new_rows + [("d9", "iota kappa lambda mu nu omicron")]
    new, base = mk_docs(spark, new_rows), mk_docs(spark, base_rows)
    union = new.unionByName(base)
    from entityresolution_capstone_spark.functions.tfidf import doc_frequencies

    tdict = B.token_dictionary(doc_frequencies(union))
    nb = B.build_blocks(new, tdict, CFG)
    bb = B.build_blocks(base, tdict, CFG)
    got = sorted(
        (r["new_id"], r["base_id"])
        for r in cross_candidate_pairs(nb, bb, CFG).collect()
    )
    new_ids = {r[0] for r in new_rows}
    full = B.candidate_pairs(B.build_blocks(union, tdict, CFG), CFG)
    want = sorted(
        (a, b) if a in new_ids else (b, a)
        for a, b in ((r["id1"], r["id2"]) for r in full.collect())
        if (a in new_ids) != (b in new_ids)
    )
    assert got == want and len(got) > 0


def test_bad_linkage_raises(spark, corpora):
    base, clusters, new = corpora
    with pytest.raises(ValueError, match="linkage"):
        attach_to_clusters(new, base, clusters, CFG, SCORING, 0.8, "median")
