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


def gap_fill(
    series: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    step: str = "interval 1 hour",
) -> DataFrame:
    """Densify a per-key time series onto a fixed-step grid, filling gaps by
    carrying the last observation forward (LOCF).

    Input: one row per (key, bucket_ts) that was observed. Output: one row per
    (key, grid_ts) for every step between the key's first and last
    observation, with ``value_cols`` carried forward across gaps and a
    ``filled`` flag marking synthesized rows.

    Plan: per-key span aggregate (tiny) -> ``sequence()`` explode builds the
    grid -> one left join back onto observations (shuffle on (key, ts)) ->
    ONE window pass per key for the LOCF. No driver-side loop, no UDF; gap
    length is bounded by the span, and the first grid row per key is always
    observed, so the carry never reads null. The derived-column pattern is
    the same shape Structured Streaming would use with
    ``applyInPandasWithState``; for batch it is pure window algebra.
    """
    spans = series.groupBy(key_col).agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    grid = spans.select(
        key_col, F.explode(F.expr(f"sequence(_lo, _hi, {step})")).alias(ts_col)
    )
    # join marker: `filled` must flag SYNTHESIZED rows, not rows whose first
    # value column is genuinely NULL (ADVICE r2) — an observed NULL row keeps
    # filled=false and its NULLs are still LOCF-carried like any gap.
    joined = grid.join(
        series.withColumn("_observed", F.lit(True)), [key_col, ts_col], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        ts_col,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
        F.col("_observed").isNull().alias("filled"),
    )
