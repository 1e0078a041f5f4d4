"""Text-analysis operators over the documents table."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators import textstats as TS

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_language_id_english_sentence(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog went to the house in the garden"),
            (2, "der Hund ist nicht mit der Katze und das ist gut"),
            (3, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in TS.language_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "unknown"


def test_quality_scores_bounds_and_signal(spark, documents):
    q = TS.quality_scores(documents)
    assert q.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count() == 0
    row = TS.quality_scores(
        spark.createDataFrame(
            [(1, "the cat is in the house and it is warm for the winter season now"),
             (2, "!!!! ???? 12345 @@@@")],
            ["doc_id", "text"],
        )
    ).collect()
    by_id = {r["doc_id"]: r["quality"] for r in row}
    assert by_id[1] > by_id[2]


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "hello worldly supercalifragilistic a")], ["doc_id", "text"])
    r = TS.token_counts(df).collect()[0]
    assert r["ws_tokens"] == 4
    # ceil(5/4)+ceil(7/4)+ceil(20/4)+ceil(1/4) = 2+2+5+1
    assert r["subword_est"] == 10


def test_fingerprints_order_sensitive_and_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta alpha gamma"), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in TS.doc_fingerprints(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]


def test_fingerprints_stable_across_partitioning(spark, documents):
    f1 = sorted(TS.doc_fingerprints(documents).collect())
    f2 = sorted(TS.doc_fingerprints(documents.repartition(7)).collect())
    assert f1 == f2


def test_scrub_pii(spark):
    from entityresolution_capstone_spark.operators.textstats import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-1.org and x@y.io now"),
            (2, "see https://a.io/p?q=1 or http://b.c/d before end"),
            (3, "call +12345678 or +123456789012345 not +123 now"),
            (4, "clean text with no pii at all"),
            (5, "mix u@v.wx http://z.a +9876543 done"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in scrub_pii(docs).collect()}
    assert out[1]["clean_text"] == "mail <EMAIL> and <EMAIL> now"
    assert out[1]["n_emails"] == 2
    assert out[2]["clean_text"] == "see <URL> or <URL> before end"
    assert out[2]["n_urls"] == 2
    # +123 is too short for the 7-15 digit phone pattern
    assert out[3]["clean_text"] == "call <PHONE> or <PHONE> not +123 now"
    assert out[3]["n_phones"] == 2
    assert out[4]["clean_text"] == "clean text with no pii at all"
    assert (out[4]["n_emails"], out[4]["n_urls"], out[4]["n_phones"]) == (0, 0, 0)
    assert out[5]["clean_text"] == "mix <EMAIL> <URL> <PHONE> done"


def test_pack_documents(spark):
    from pyspark.sql import functions as F

    from entityresolution_capstone_spark.operators.textstats import pack_documents

    docs = spark.createDataFrame(
        [(i, "tok " * (10 + (i * 7) % 40)) for i in range(300)],
        "doc_id long, text string",
    )
    out = pack_documents(docs, token_budget=100, n_buckets=8)
    rows = out.collect()
    assert len(rows) == 300
    # every doc assigned; within a bucket, sequence token totals respect the
    # budget except for the one doc that straddles a boundary
    per_seq = (
        out.groupBy("bucket", "seq_id").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert all(r["t"] < 100 + 50 for r in per_seq)  # max doc is 49 tokens
    # assignment is independent of physical partitioning
    again = pack_documents(
        docs.orderBy(F.rand(seed=3)).repartition(11), token_budget=100, n_buckets=8
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_repetition_scores(spark):
    from entityresolution_capstone_spark.operators.textstats import repetition_scores

    docs = spark.createDataFrame(
        [
            # "a b a b a": 2-grams = [ab, ba, ab, ba] -> total 4, distinct 2,
            # top 2; 3-grams = [aba, bab, aba] -> total 3, distinct 2
            (1, "a b a b a"),
            # no repetition: 2-grams all distinct
            (2, "one two three four"),
            # empty text -> zeroed row kept
            (3, "   "),
            # shorter than n: one whole-array gram for both n
            (4, "solo"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    assert out[1]["n_2grams"] == 4
    assert abs(out[1]["dup_2gram_frac"] - 0.5) < 1e-9
    assert abs(out[1]["top_2gram_frac"] - 0.5) < 1e-9
    assert abs(out[1]["dup_3gram_frac"] - (1 / 3)) < 1e-9
    assert out[2]["dup_2gram_frac"] == 0.0
    assert abs(out[2]["top_2gram_frac"] - (1 / 3)) < 1e-9
    assert out[3]["n_2grams"] == 0 and out[3]["dup_2gram_frac"] == 0.0
    assert out[4]["n_2grams"] == 1 and out[4]["dup_2gram_frac"] == 0.0


def test_domain_stats(spark):
    from entityresolution_capstone_spark.operators.textstats import domain_stats

    docs = spark.createDataFrame(
        [
            (1, "see http://A.example.COM/x and https://b.org/y"),
            (2, "again http://a.EXAMPLE.com/z here"),
            (3, "no urls at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["domain"]: r for r in domain_stats(docs).collect()}
    assert out["a.example.com"]["n_docs"] == 2
    assert out["a.example.com"]["n_urls"] == 2
    assert out["b.org"]["n_docs"] == 1
    assert set(out) == {"a.example.com", "b.org"}


def test_chunk_documents(spark):
    from entityresolution_capstone_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens, 1 chunk
            (2, " ".join(f"t{i}" for i in range(25))),  # 25 -> chunks at 0,20
            (3, ""),  # empty -> one empty chunk
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=20, overlap=0).collect()
    by = {}
    for r in out:
        by.setdefault(r["doc_id"], []).append(r)
    assert len(by[1]) == 1 and by[1][0]["n_tokens"] == 10
    assert len(by[2]) == 2
    c = sorted(by[2], key=lambda r: r["chunk_idx"])
    assert c[0]["n_tokens"] == 20 and c[1]["n_tokens"] == 5
    assert c[1]["chunk_text"].split() == [f"t{i}" for i in range(20, 25)]
    assert len(by[3]) == 1 and by[3][0]["n_tokens"] == 0

    # overlap: stride = chunk - overlap; consecutive chunks share `overlap`
    ov = chunk_documents(docs.filter("doc_id = 2"), chunk_tokens=20, overlap=5)
    c = sorted(ov.collect(), key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in c] == [0, 1]
    assert c[0]["chunk_text"].split()[15:] == c[1]["chunk_text"].split()[:5]


def test_unigram_logprob_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "!!!")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TS.unigram_logprob(df).collect()}
    # counts: a=2, b=2, c=1, total=5; micro-nat terms frozen per vocab entry
    m_a = round(-math.log(2 / 5) * 1e6)  # == m_b
    m_c = round(-math.log(1 / 5) * 1e6)
    assert out[1]["n_tokens"] == 3
    assert out[1]["mean_nll"] == pytest.approx((2 * m_a + m_a) / 3e6)
    assert out[2]["n_tokens"] == 2
    assert out[2]["mean_nll"] == pytest.approx((m_a + m_c) / 2e6)
    # empty doc keeps a zeroed row
    assert out[3]["n_tokens"] == 0 and out[3]["mean_nll"] == 0.0
    # rare-token docs score strictly higher than common-token docs
    assert out[2]["mean_nll"] > out[1]["mean_nll"]


def test_corpus_quantiles_exact_ranks(spark):
    # values 1..10: rank rule = value at max(1, ceil(q*n))
    df = spark.createDataFrame([(i, i) for i in range(1, 11)], "doc_id long, v long")
    got = {
        r["q"]: r["value"]
        for r in TS.corpus_quantiles(df, "v", [0.1, 0.25, 0.5, 0.75, 1.0]).collect()
    }
    assert got == {0.1: 1, 0.25: 3, 0.5: 5, 0.75: 8, 1.0: 10}


def test_corpus_quantiles_integer_rank_arithmetic(spark):
    # 0.1 * 500 = 50.0000000000000028 in doubles -> float ceil gives 51;
    # the integer micro-rank rule must yield exactly 50
    df = spark.createDataFrame([(i, i) for i in range(1, 501)], "doc_id long, v long")
    got = {r["q"]: r["value"] for r in TS.corpus_quantiles(df, "v", [0.1]).collect()}
    assert got == {0.1: 50}


def test_corpus_quantiles_deterministic_under_ties(spark):
    # all-equal values: every quantile is that value, ties broken by id
    df = spark.createDataFrame([(i, 7) for i in range(20)], "doc_id long, v long")
    out = TS.corpus_quantiles(df, "v", [0.5, 0.9]).collect()
    assert sorted((r["q"], r["value"]) for r in out) == [(0.5, 7), (0.9, 7)]


def test_oov_rates_top_k_vocab(spark):
    # corpus counts: a=4, b=2, c=1, d=1 -> top-2 vocab = {a, b}
    df = spark.createDataFrame(
        [(1, "a a b c"), (2, "a a b d"), (3, "!!!")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in TS.oov_rates(df, vocab_size=2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["oov_tokens"] == 1
    assert out[1]["oov_rate"] == pytest.approx(0.25)
    assert out[2]["oov_tokens"] == 1
    assert out[3]["n_tokens"] == 0 and out[3]["oov_rate"] == 0.0


def test_oov_rates_tie_break_on_token(spark):
    # b and c tie at count 2; rank orders (cnt desc, token asc) -> b in, c out
    df = spark.createDataFrame([(1, "b b c c")], "doc_id long, text string")
    r = TS.oov_rates(df, vocab_size=1).collect()[0]
    assert r["oov_tokens"] == 2 and r["oov_rate"] == pytest.approx(0.5)
