"""filter_cascade (operators/textstats.py) + leakage_safe_split
(operators/dedup.py) — the training-pipeline composites."""

from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators.dedup import (
    hash_split,
    leakage_safe_split,
)
from entityresolution_capstone_spark.operators.textstats import filter_cascade


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cascade_reason_order_first_failing_rule_wins(spark):
    # doc 1: no stopwords in any language -> lang (even though it's also short)
    # doc 2: English stopwords but < 25 tokens -> length
    # doc 3: 31 distinct digit-heavy tokens + one stopword -> quality
    #        (passes lang + length, no repeated grams)
    # doc 4: long, English, high quality, repeated blocks -> repetition
    # doc 5: stopword-rich with all-unique 2-/3-grams -> pass
    en = "the and is in it of to was he for on are with "
    filler = "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    doc3 = "the " + " ".join(str(7001 + 13 * i) * 9 for i in range(30))
    doc4 = (en + filler) * 2 + ("red blue " * 40)
    stop = ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"]
    doc5 = " ".join(f"{stop[i % 10]} word{i}" for i in range(30))
    docs = _docs(
        spark,
        [
            (1, "zzz qqq xxx"),
            (2, en),
            (3, doc3),
            (4, doc4),
            (5, doc5),
        ],
    )
    out = {r["doc_id"]: (r["reason"], r["keep"]) for r in filter_cascade(docs).collect()}
    assert out[1] == ("lang", False)
    assert out[2] == ("length", False)
    assert out[3] == ("quality", False)
    assert out[4] == ("repetition", False)
    assert out[5] == ("pass", True)


def test_cascade_every_doc_gets_exactly_one_row(spark):
    docs = _docs(spark, [(i, "the and is word%d " % i * 30) for i in range(12)])
    out = filter_cascade(docs)
    assert out.count() == 12
    assert out.select("doc_id").distinct().count() == 12


def test_leakage_safe_split_cluster_never_straddles(spark):
    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    # three chained clusters + singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id1 long, id2 long",
    )
    out = leakage_safe_split(docs, pairs, weights={"train": 0.5, "val": 0.5})
    rows = {r["doc_id"]: (r["cluster_rep"], r["split"]) for r in out.collect()}
    assert len(rows) == 40
    # every member of a component shares rep AND split
    for comp in ([0, 1, 2], [10, 11], [20, 21, 22, 23]):
        reps = {rows[i][0] for i in comp}
        splits = {rows[i][1] for i in comp}
        assert reps == {min(comp)}
        assert len(splits) == 1
    # singleton reps are their own ids
    assert rows[5][0] == 5


def test_leakage_safe_split_matches_hash_split_on_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    empty = spark.createDataFrame([], "id1 long, id2 long")
    a = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, empty, seed=11).collect()
    }
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id", seed=11).collect()
    }
    assert a == b


def test_leakage_safe_split_weights_roughly_respected(spark):
    docs = spark.createDataFrame([(i,) for i in range(400)], "doc_id long")
    empty = spark.createDataFrame([], "id1 long, id2 long")
    out = leakage_safe_split(docs, empty, weights={"train": 0.9, "val": 0.1})
    frac = (
        out.agg(F.avg((F.col("split") == "train").cast("double"))).collect()[0][0]
    )
    assert 0.8 < frac < 0.98
