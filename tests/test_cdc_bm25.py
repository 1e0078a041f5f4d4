"""CDC chunking shift-robustness + BM25 hand-computed goldens."""

import math

from entityresolution_capstone_spark.operators.textstats import bm25_scores, cdc_chunks


def test_cdc_chunks_cover_docs(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i % 31}" for i in range(80))), (2, "a b"), (3, "")],
        ["doc_id", "text"],
    )
    rows = cdc_chunks(docs).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # every token of doc 1 lands in exactly one chunk, chunks are contiguous
    chunks = sorted(by_doc[1], key=lambda r: r["start_pos"])
    assert chunks[0]["start_pos"] == 0
    total = 0
    for i, ch in enumerate(chunks):
        assert ch["chunk_id"] == i
        assert ch["start_pos"] == total
        total += ch["n_tokens"]
    assert total == 80
    # short doc: single chunk; empty doc: no rows
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 2
    assert 3 not in by_doc


def test_cdc_boundaries_resynchronize(spark):
    # same tail content after an early insertion -> chunk hashes shared
    body = " ".join(f"w{i % 29}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, body), (2, "INSERTED " + body)], ["doc_id", "text"]
    )
    rows = cdc_chunks(docs).collect()
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    # fixed windows would share nothing; CDC re-syncs after the first boundary
    assert h1 & h2, "shifted doc must share chunk hashes with the original"


def test_bm25_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog dog dog dog"),
            (3, "bird fish"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in bm25_scores(docs, ["cat", "dog"]).collect()}
    N, S = 3, 9
    avglen = S / N

    def term(tf, df, length):
        idf = math.log((N - df + 0.5) / (df + 0.5))
        x = idf * ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (length / avglen))))
        return math.floor(x * 1e9 + 0.5)

    exp1 = round((term(2, 1, 3) + term(1, 2, 3)) / 1e9, 6)
    exp2 = round(term(4, 2, 4) / 1e9, 6)
    assert out[1]["n_hits"] == 2 and out[1]["bm25"] == exp1
    assert out[2]["n_hits"] == 1 and out[2]["bm25"] == exp2
    assert out[3]["n_hits"] == 0 and out[3]["bm25"] == 0.0
