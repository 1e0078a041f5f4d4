"""Blocking: key generation, MinHash-LSH banding, hot-block capping, pair gen."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark import datagen
from entityresolution_capstone_spark.functions.tfidf import doc_frequencies
from entityresolution_capstone_spark.operators import blocking as B
from entityresolution_capstone_spark.operators.canonicalize import canonical_docs


@pytest.fixture(scope="module")
def docs_and_dict(spark):
    spec = datagen.CorpusSpec(n_entities=20, convs_per_entity=3, seed=5)
    transcripts, labels = datagen.corpus_dataframes(spark, spec)
    docs = canonical_docs(transcripts).cache()
    dft = doc_frequencies(docs)
    tdict = B.token_dictionary(dft).cache()
    return docs, tdict, labels


def test_pairs_are_canonical_and_distinct(docs_and_dict):
    docs, tdict, _ = docs_and_dict
    cfg = B.BlockingConfig()
    blocks = B.build_blocks(docs, tdict, cfg)
    pairs = B.candidate_pairs(blocks, cfg)
    assert pairs.filter(F.col("id1") >= F.col("id2")).count() == 0
    assert pairs.count() == pairs.distinct().count()


def test_same_entity_convs_share_block(docs_and_dict):
    """Recall check: nearly all same-entity conv pairs must be candidates."""
    docs, tdict, labels = docs_and_dict
    cfg = B.BlockingConfig()
    pairs = B.candidate_pairs(B.build_blocks(docs, tdict, cfg), cfg)
    l1 = labels.selectExpr("conv_id as id1", "entity_id as e1")
    l2 = labels.selectExpr("conv_id as id2", "entity_id as e2")
    true_pairs = (
        l1.crossJoin(l2)
        .filter((F.col("id1") < F.col("id2")) & (F.col("e1") == F.col("e2")))
        .select("id1", "id2")
    )
    n_true = true_pairs.count()
    n_found = true_pairs.join(pairs, ["id1", "id2"]).count()
    assert n_found / n_true >= 0.98, f"blocking recall {n_found}/{n_true}"


def test_hot_block_capped(spark, docs_and_dict):
    """The seeded hot token must produce a block that gets capped + reported."""
    docs, tdict, _ = docs_and_dict
    cfg = B.BlockingConfig(max_block_size=5, use_minhash=False)
    blocks = B.build_blocks(docs, tdict, cfg)
    metrics = B.block_size_metrics(blocks, cfg)
    dropped = metrics.filter(F.col("dropped"))
    assert dropped.count() > 0
    # no pair may come from a dropped block alone
    pairs = B.candidate_pairs(blocks, cfg)
    biggest = metrics.orderBy(F.desc("size")).first()
    assert biggest["size"] > cfg.max_block_size


def test_minhash_bands_deterministic(docs_and_dict):
    docs, tdict, _ = docs_and_dict
    cfg = B.BlockingConfig()
    s1 = sorted(B.minhash_signatures(docs, tdict, cfg).collect())
    s2 = sorted(B.minhash_signatures(docs.repartition(3), tdict, cfg).collect())
    assert s1 == s2


def test_minhash_identical_docs_collide(spark, docs_and_dict):
    _, tdict, _ = docs_and_dict
    docs, _ = docs_and_dict[:2]
    cfg = B.BlockingConfig()
    two = docs.limit(1).union(docs.limit(1).withColumn("conv_id", F.lit("zz_copy")))
    sigs = B.minhash_signatures(two, tdict, cfg)
    # identical token sets -> identical band keys -> all keys shared
    per_key = sigs.groupBy("block_key").count()
    assert per_key.filter(F.col("count") != 2).count() == 0


# ---------------------------------------------------------------------------
# sorted-neighborhood blocking
# ---------------------------------------------------------------------------

def _snm_brute(rows, window):
    """Scalar SNM oracle: sort by (key, id), pair ranks within window."""
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    out = set()
    for i in range(len(order)):
        for j in range(i + 1, min(i + window, len(order))):
            a, b = order[i][0], order[j][0]
            out.add((min(a, b), max(a, b)))
    return out


def test_snm_matches_brute_force(spark):
    import random

    from entityresolution_capstone_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(41)
    rows = [
        (f"r{i:03d}", "".join(rng.choice("abc") for _ in range(3)))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "conv_id string, key string")
    for window in (2, 5, 9):
        got = {
            (r.id1, r.id2)
            for r in sorted_neighborhood_pairs(df, "key", window).collect()
        }
        assert got == _snm_brute(rows, window), f"window={window}"


def test_snm_identical_keys_stay_linear(spark):
    """A degenerate key (every record identical) must still produce exactly
    the window pairs — the property equality blocking lacks (one quadratic
    hot block); ties broken by id keep the output deterministic."""
    from entityresolution_capstone_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    n, w = 200, 6
    rows = [(f"r{i:03d}", "same") for i in range(n)]
    df = spark.createDataFrame(rows, "conv_id string, key string")
    pairs = sorted_neighborhood_pairs(df, "key", w).collect()
    # linear pair count: sum over ranks of min(w-1, n-1-rank)
    expected = sum(min(w - 1, n - 1 - i) for i in range(n))
    assert len(pairs) == expected == len({(p.id1, p.id2) for p in pairs})
    assert all(p.id1 < p.id2 for p in pairs)


def test_snm_window_validation(spark):
    import pytest as _pytest

    from entityresolution_capstone_spark.operators.blocking import (
        sorted_neighborhood_pairs,
    )

    df = spark.createDataFrame([("a", "x")], "conv_id string, key string")
    with _pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "key", 1)
