"""Range (interval-containment) join — bucketized, never a cross product.

Joins point rows (one timestamp) to interval rows (``[start, end]``, both
inclusive) sharing equality keys. Spark's own planner turns a plain
``l.ts BETWEEN r.start AND r.end`` join into BroadcastNestedLoopJoin (or a
cartesian product when neither side broadcasts) — an O(|L|·|R|) plan that is
unusable at 10^12 rows. The scalable shape is the binned range join (the
published optimization in Databricks Runtime and in time-series engines such
as Flint's interval joins): quantize time into fixed-width buckets, replicate
each interval to every bucket it overlaps, equi-join on (keys..., bucket),
then apply the exact bound predicate.

Why this scales:
- The join is a pure equi-join — hash-partitioned shuffle, AQE-splittable,
  no nested loop anywhere.
- A point lands in EXACTLY ONE bucket, so every (point, interval) match is
  produced exactly once — no post-join ``distinct()`` over the match set
  (the same no-dedup-shuffle principle as blocking/dedup pair enumeration).
- Replication factor per interval is ``1 + span/width`` — bounded by
  ``max_buckets_per_interval`` (a hard error, not a silent truncation:
  an unbounded interval would otherwise fan out the build side).

Pick ``bucket_width_s`` near the typical interval span: too small inflates
interval replication, too large inflates the per-bucket candidate set the
bound predicate must filter. Both failure modes are linear, never quadratic.

The DuckDB correctness oracle uses the naive inequality join directly
(exact same semantics, feasible at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str = "ts",
    start_ts: str = "start_ts",
    end_ts: str = "end_ts",
    bucket_width_s: int = 3600,
    max_buckets_per_interval: int = 1024,
) -> DataFrame:
    """Inner-join points to every containing interval.

    Output: all ``points`` columns + the interval's non-key columns. Bounds
    are inclusive on both ends (``start <= ts <= end``). Intervals with
    ``end < start`` match nothing; an interval spanning more than
    ``max_buckets_per_interval`` buckets raises at evaluation time rather
    than silently exploding the replication.
    """
    width_us = int(bucket_width_s) * 1_000_000

    def bucket_of(col):
        return F.floor(F.unix_micros(F.col(col).cast("timestamp")) / width_us)

    n_buckets = bucket_of(end_ts) - bucket_of(start_ts) + 1
    guarded = F.when(
        n_buckets <= F.lit(max_buckets_per_interval),
        F.sequence(bucket_of(start_ts), bucket_of(end_ts)),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "range_join: interval spans %d buckets > max_buckets_per_interval=%d"
                " — widen bucket_width_s or cap interval spans upstream",
                n_buckets.cast("int"),
                F.lit(max_buckets_per_interval),
            )
        )
    )
    ivl_cols = [c for c in intervals.columns if c not in on]
    r = intervals.filter(
        F.col(start_ts) <= F.col(end_ts)
    ).withColumn("_bucket", F.explode(guarded))
    l = points.withColumn("_bucket", bucket_of(point_ts))
    joined = l.join(r, [*on, "_bucket"]).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.select(*points.columns, *ivl_cols)
