"""Stage 1 — materialize per-conversation canonical documents.

North rule: "window-ordered canonical-document materialization ... stable
turn_idx ordering preserving per-turn text equality with the reference".

Implementation note (Spark-first): the semantically window-ordered concat is
expressed as ``groupBy(conv_id) + array_sort(collect_list(struct(turn_idx,
...)))`` — one shuffle, map-side partial aggregation, no window-function state.
A ``Window.partitionBy(conv_id).orderBy(turn_idx)`` formulation computes the
identical result but costs a full sort within partitions plus a second
projection; ``array_sort`` on the collected per-conversation turn lists sorts
only within each group and keeps the plan a single hash aggregate. Per-turn
text equality is testable by exploding the sorted struct array back out
(tests/test_canonicalize.py).

The struct sort key is (turn_idx, ts, role, text, ...) — struct ordering is
lexicographic on fields, so ordering is total and deterministic even if a
turn_idx were duplicated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize

# Short representative key for the character-level kernels (JW / Levenshtein).
# Bounded so edit-distance cost is O(PREFIX^2) per pair regardless of doc size;
# any SQL oracle must apply the same truncation.
DOC_PREFIX_LEN = 64


def canonical_docs(
    transcripts: DataFrame,
    prefix_len: int = DOC_PREFIX_LEN,
    keep_turns: bool = False,
) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) -> canonical docs.

    Output: (conv_id, doc, doc_prefix, tokens, n_turns, first_ts, last_ts).
    ``doc`` is the space-joined turn texts in stable (turn_idx, ts) order.
    With ``keep_turns`` the sorted struct array ``_turns`` is retained (used by
    the per-turn equality invariant test).
    """
    turns = F.array_sort(
        F.collect_list(F.struct("turn_idx", "ts", "text"))
    )
    agg = transcripts.groupBy("conv_id").agg(
        turns.alias("_turns"),
        F.count("*").alias("n_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
    doc = F.array_join(F.transform("_turns", lambda t: t["text"]), " ")
    cols = [
        F.col("conv_id"),
        doc.alias("doc"),
        F.substring(doc, 1, prefix_len).alias("doc_prefix"),
        tokenize(doc).alias("tokens"),
        F.col("n_turns").cast("int").alias("n_turns"),
        F.col("first_ts"),
        F.col("last_ts"),
    ]
    if keep_turns:
        cols.append(F.col("_turns"))
    return agg.select(*cols)


def ordered_turns(transcripts: DataFrame) -> DataFrame:
    """Turns with a per-conversation dense order column (window op).

    Used by tests to verify the per-turn text-equality invariant and by the
    streaming path; demonstrates the window-function formulation of the same
    ordering contract.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return transcripts.withColumn("turn_rank", F.row_number().over(w) - 1)


def explode_docs_to_turns(docs_with_turns: DataFrame) -> DataFrame:
    """Inverse check helper: canonical `_turns` array back to one row per turn."""
    return docs_with_turns.select(
        "conv_id", F.posexplode("_turns").alias("pos", "turn")
    ).select("conv_id", "pos", F.col("turn.turn_idx").alias("turn_idx"), F.col("turn.text").alias("text"))
