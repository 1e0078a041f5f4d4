"""Survivorship: one canonical record per resolved entity cluster.

The reference pipeline stops at the cluster assignment
(/root/reference/src/entity_resolver/core/resolver.py returns id -> cluster);
every production ER deployment then needs the *merge* step — pick a surviving
record per entity and aggregate membership evidence. This operator is that
step, shaped for 10^12 rows:

- ONE map-side-combinable ``groupBy(cluster_id)`` aggregation — no window
  functions, no per-cluster sort, no driver collect;
- the representative is chosen inside the aggregate via
  ``min(struct(-len(text), id))``: longest text wins, ties break to the least
  id — deterministic under any row order and any partitioning;
- the representative's full text is restored by a narrow self-join on
  (cluster_id, rep_id) AFTER aggregation, so the shuffle carries lengths, not
  documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_records(
    docs: DataFrame,
    assignment: DataFrame,
    text_col: str = "doc",
    id_col: str = "conv_id",
    with_text: bool = False,
) -> DataFrame:
    """(cluster_id, rep_id, n_members, total_chars[, rep_text]).

    ``docs``: one row per record with ``id_col`` + ``text_col``;
    ``assignment``: (id_col, cluster_id) as produced by the clustering stage.
    ``with_text=True`` joins the representative's text back on (one
    equi-join keyed by the already-aggregated cluster table — broadcastable
    when clusters ≪ records).
    """
    j = assignment.select(id_col, "cluster_id").join(
        docs.select(id_col, F.col(text_col).alias("_text")), id_col
    )
    agg = (
        j.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum(F.length("_text")).cast("long").alias("total_chars"),
            F.min(
                F.struct(
                    (-F.length("_text")).cast("long").alias("_nl"),
                    F.col(id_col).alias("_id"),
                )
            ).alias("_rep"),
        )
        .select(
            "cluster_id",
            F.col("_rep._id").alias("rep_id"),
            "n_members",
            "total_chars",
        )
    )
    if not with_text:
        return agg
    rep_docs = docs.select(
        F.col(id_col).alias("rep_id"), F.col(text_col).alias("rep_text")
    )
    return agg.join(rep_docs, "rep_id").select(
        "cluster_id", "rep_id", "n_members", "total_chars", "rep_text"
    )
