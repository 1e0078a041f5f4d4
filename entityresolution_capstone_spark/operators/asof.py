"""Point-in-time (as-of) join — the feature/training-data join Spark lacks.

For each left row, attach the latest right row with the same key and
``right.ts <= left.ts`` (backward as-of, inclusive — the point-in-time-correct
lookup used when materializing training features so no future data leaks).

Plan (Spark-first, join-free): tag both sides, union, ONE window pass per key
ordered by (ts, side) carrying the last non-null right payload forward, then
keep the left rows. Cost is a single shuffle on the key — the naive
range-join formulation explodes to O(|L|·|R|) pairs per key before its
aggregation, and Spark has no native ASOF operator (the DuckDB correctness
oracle uses its ``ASOF LEFT JOIN`` directly).

Tie semantics: at equal timestamps the right row is ordered BEFORE the left
row, so a same-instant right row is visible to the left row (matches ASOF's
``l.ts >= r.ts``). Callers must dedupe the right side to one row per
(key, ts) to keep the join deterministic (both engines do the same dedupe).

At cluster scale: the union shuffles once on the key; within a partition the
window sort is the only work. Skewed keys behave like any window skew —
bound them upstream (per-key right-side dedupe already collapses bursts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + ``prefix<ts_col>`` / ``prefix<payload>`` columns (null when
    no right row precedes). ``right`` must be unique per (on..., ts_col)."""
    payload_cols = payload_cols or [
        c for c in right.columns if c not in set(on) | {ts_col}
    ]
    pay = F.struct(
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
    )
    r = right.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        pay.alias("_p"),
        F.lit(None).cast("string").alias("_lrow_marker"),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *on,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        F.lit("l").alias("_lrow_marker"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
    out_cols = [F.col(f"_l_{c}").alias(c) for c in left_cols]
    out_cols.append(F.col(f"_asof.{prefix}{ts_col}").alias(f"{prefix}{ts_col}"))
    out_cols += [
        F.col(f"_asof.{prefix}{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return carried.filter(F.col("_lrow_marker").isNotNull()).select(*out_cols)
