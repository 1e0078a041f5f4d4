"""keep_best_duplicates + hash_split (operators/dedup.py)."""

from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators.dedup import (
    hash_split,
    keep_best_duplicates,
)


def test_keep_best_transitive_and_ties(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    # chain 1-2-3 forms one cluster; 4 and 5 are singletons
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id1 long, id2 long")
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1), (5, 0.7)],
        "doc_id long, quality double",
    )
    out = {
        r["doc_id"]: (r["cluster_id"], r["keep"])
        for r in keep_best_duplicates(docs, pairs, quality).collect()
    }
    # cluster root is min id; survivor is max quality with smallest-id tie-break
    assert out[1] == (1, False)
    assert out[2] == (1, True)   # 0.9 tie with 3, smaller id wins
    assert out[3] == (1, False)
    assert out[4] == (4, True)   # singletons keep themselves
    assert out[5] == (5, True)


def test_keep_best_exactly_one_survivor_per_cluster(spark):
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 18, 2)], "id1 long, id2 long"
    )
    quality = docs.select("doc_id", (F.col("doc_id") % 7 / 10.0).alias("quality"))
    per_cluster = (
        keep_best_duplicates(docs, pairs, quality)
        .groupBy("cluster_id")
        .agg(F.sum(F.col("keep").cast("int")).alias("n_keep"))
        .collect()
    )
    assert all(r["n_keep"] == 1 for r in per_cluster)


def test_hash_split_deterministic_and_orderfree(spark):
    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    shuffled = docs.orderBy(F.rand(seed=1)).repartition(7)
    b = {r["doc_id"]: r["split"] for r in hash_split(shuffled, "doc_id").collect()}
    assert a == b
    # ratios roughly honor the 90/5/5 weights
    from collections import Counter

    c = Counter(a.values())
    assert 0.85 < c["train"] / 2000 < 0.95
    assert c["train"] + c["val"] + c["test"] == 2000


def test_hash_split_stable_under_corpus_growth(spark):
    small = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    big = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())


def test_stratified_sample(spark):
    from pyspark.sql import functions as F

    from entityresolution_capstone_spark.operators.dedup import stratified_sample

    docs = spark.createDataFrame(
        [(i, "low" if i % 2 == 0 else "high") for i in range(2000)],
        "doc_id long, stratum string",
    )
    kept = stratified_sample(docs, "stratum", {"low": 0.2, "high": 0.9}, "doc_id")
    frac = {
        r["stratum"]: r["n"] / 1000
        for r in kept.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert abs(frac["low"] - 0.2) < 0.05 and abs(frac["high"] - 0.9) < 0.05
    # deterministic: same input -> same kept set, regardless of partitioning
    again = stratified_sample(
        docs.orderBy(F.rand(seed=5)).repartition(7), "stratum",
        {"low": 0.2, "high": 0.9}, "doc_id",
    )
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    # monotone: raising a rate strictly grows the kept set (no resample churn)
    bigger = stratified_sample(docs, "stratum", {"low": 0.5, "high": 0.9}, "doc_id")
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in bigger.collect()}
    assert a <= b and len(b) > len(a)
