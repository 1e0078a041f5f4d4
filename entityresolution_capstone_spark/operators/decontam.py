"""Benchmark decontamination: n-gram overlap of a corpus against an eval set.

The standard pre-training hygiene pass (GPT-3 appendix C / PaLM-style):
a training document is *contaminated* when it shares at least ``min_hits``
distinct word n-grams with any single benchmark document.

100-TB shape: the benchmark side is an eval suite — thousands of documents,
not billions — so its gram table is **broadcast**; the corpus side streams
through one narrow projection (tokenize -> distinct grams -> explode), a
broadcast hash join, and a groupBy on ``doc_id`` whose input is only the
*matching* gram rows (corpus rows with no benchmark overlap never reach the
shuffle: the inner join drops them, and the final left-join restores them
with zero counts from the cheap per-doc gram-count aggregate). No corpus
self-join, no cartesian product, no UDF — pure Column algebra end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_ngrams, tokenize


def _distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram): distinct word n-grams per document (docs with < n tokens
    contribute their whole token sequence as one gram, per token_ngrams)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(token_ngrams(tokenize(F.col(text_col)), n))
        ).alias("gram"),
    )


def decontaminate(
    documents: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_grams, max_overlap, n_bench_hit, contaminated).

    - ``n_grams``: distinct word ``n``-grams in the document;
    - ``max_overlap``: largest count of shared distinct grams with any ONE
      benchmark document (0 when nothing matches);
    - ``n_bench_hit``: number of benchmark documents sharing >= ``min_hits``
      grams with this document;
    - ``contaminated``: ``max_overlap >= min_hits``.

    Contamination is per (train doc, bench doc) pair — a document that shares
    one stray gram with each of fifty benchmark items is NOT contaminated;
    one that shares ``min_hits`` grams with a single item is.
    """
    doc_grams = _distinct_grams(documents, id_col, text_col, n)
    bench_grams = _distinct_grams(
        benchmark, bench_id_col, bench_text_col, n
    ).withColumnRenamed("_id", "_bid")

    # per-doc distinct-gram count as a pure projection (one doc's grams are a
    # single row's array) — no corpus-wide explode+shuffle just to count
    sizes = documents.select(
        F.col(id_col).alias("_id"),
        F.size(F.array_distinct(token_ngrams(tokenize(F.col(text_col)), n)))
        .cast("long")
        .alias("n_grams"),
    ).filter(F.col("n_grams") > 0)

    overlap = (
        doc_grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("_id", "_bid")
        .agg(F.count("*").alias("_ov"))
    )
    per_doc = overlap.groupBy("_id").agg(
        F.max("_ov").cast("long").alias("max_overlap"),
        F.sum(F.when(F.col("_ov") >= min_hits, 1).otherwise(0))
        .cast("long")
        .alias("n_bench_hit"),
    )
    return (
        sizes.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias("doc_id"),
            "n_grams",
            F.coalesce("max_overlap", F.lit(0)).cast("long").alias("max_overlap"),
            F.coalesce("n_bench_hit", F.lit(0)).cast("long").alias("n_bench_hit"),
            (F.coalesce("max_overlap", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )
