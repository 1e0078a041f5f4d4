from entityresolution_capstone_spark.operators.survivorship import cluster_records


def _mk(spark):
    docs = spark.createDataFrame(
        [
            ("a", "xxxx"),      # len 4
            ("b", "yyyyyy"),    # len 6  <- rep of cluster a
            ("c", "zzzzzz"),    # len 6  (tie with b -> least id wins: b)
            ("d", "k"),         # singleton
        ],
        "conv_id string, doc string",
    )
    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("d", "d")],
        "conv_id string, cluster_id string",
    )
    return docs, assign


def test_cluster_records_rep_and_stats(spark):
    docs, assign = _mk(spark)
    out = {r.cluster_id: r for r in cluster_records(docs, assign).collect()}
    assert set(out) == {"a", "d"}
    assert out["a"].rep_id == "b"          # longest doc, tie -> least id
    assert out["a"].n_members == 3
    assert out["a"].total_chars == 16
    assert out["d"].rep_id == "d"
    assert out["d"].n_members == 1


def test_cluster_records_with_text(spark):
    docs, assign = _mk(spark)
    out = {
        r.cluster_id: r
        for r in cluster_records(docs, assign, with_text=True).collect()
    }
    assert out["a"].rep_text == "yyyyyy"
    assert out["d"].rep_text == "k"


def test_cluster_records_order_invariant(spark):
    """Deterministic under input reordering: the min(struct) aggregate, not
    row order, picks the representative."""
    docs, assign = _mk(spark)
    shuffled = docs.orderBy("doc").repartition(3)
    a = sorted(map(tuple, cluster_records(docs, assign).collect()))
    b = sorted(map(tuple, cluster_records(shuffled, assign).collect()))
    assert a == b
