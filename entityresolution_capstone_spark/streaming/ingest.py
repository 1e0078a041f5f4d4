"""Structured-streaming transcript ingest (incremental canonicalization).

The reference has no streaming surface at all (SURVEY.md §2.10) — this is new
Spark-native capability required for a live transcript feed:

- ``readStream`` over a growing directory of transcript parquet files;
- watermark on ``ts`` + ``dropDuplicatesWithinWatermark`` on
  (conv_id, turn_idx): late duplicate turns (at-least-once upstreams) are
  dropped, and the dedup state is EVICTED past the watermark horizon — plain
  ``dropDuplicates`` without the event-time column would grow state forever;
- ``foreachBatch`` upsert, bucket-partitioned: both the staging table and the
  docs table are hash-partitioned on ``bucket = xxhash64(conv_id) % B``. Each
  micro-batch (1) overwrites its OWN staging directory
  (``staging/batch_id=<id>/``: a retried batch replaces its previous attempt
  instead of appending a duplicate copy — idempotent, so the sink converges
  under at-least-once foreachBatch execution), (2) re-canonicalizes only the
  buckets the batch touched, reading them with partition pruning, and
  (3) rewrites ONLY those bucket partitions of the docs table via dynamic
  partition overwrite. Work per batch is O(touched buckets), not O(corpus).

A conversation's doc is a pure function of its staged turns, so a replayed
batch rewrites identical partitions (deterministic) — the docs table never
accumulates duplicates, though a reader may observe a partition mid-rewrite
on a crash-retry (the parquet sink is not transactional; use the manifest
tables in sources/tables.py when atomicity is required).

Run with ``trigger(availableNow=True)`` for backfills; continuous triggers for
live feeds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.canonicalize import canonical_docs


def read_transcript_stream(
    spark: SparkSession, input_dir: str, watermark: str = "10 minutes"
) -> DataFrame:
    return (
        spark.readStream.schema(schemas.TRANSCRIPTS)
        .parquet(input_dir)
        .withWatermark("ts", watermark)
        # WithinWatermark: state for a (conv_id, turn_idx) key is dropped once
        # the watermark passes its event time — bounded state on a live feed
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
    )


def _bucket_col(n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    docs_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    n_buckets: int = 16,
):
    """Start (and return) the streaming query. Caller awaits termination.

    ``n_buckets`` sizes the incremental-rewrite granularity: a micro-batch
    touching k conversations rewrites at most min(k, n_buckets) docs
    partitions, each ~corpus/n_buckets rows. Size it so one bucket's docs fit
    a task comfortably (at 10^9 convs, n_buckets in the tens of thousands).
    """
    stream = read_transcript_stream(spark, input_dir)
    turn_cols = [f.name for f in schemas.TRANSCRIPTS.fields]

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        b = batch.withColumn("bucket", _bucket_col(n_buckets)).persist()
        # (1) idempotent staging: overwrite THIS batch's own directory
        b.write.mode("overwrite").partitionBy("bucket").parquet(
            os.path.join(staging_dir, f"batch_id={batch_id}")
        )
        # touched buckets: bounded by n_buckets (no unbounded driver collect)
        touched = sorted(r["bucket"] for r in b.select("bucket").distinct().collect())
        b.unpersist()
        # (2) rebuild docs for touched buckets only — partition pruning reads
        # just those bucket directories across all staged batches
        staged = (
            spark.read.option("basePath", staging_dir)
            .parquet(staging_dir)
            .filter(F.col("bucket").isin(touched))
            # stream-level dedup already dropped in-horizon duplicates; this
            # catches replays that landed beyond the watermark horizon
            .dropDuplicates(["conv_id", "turn_idx"])
        )
        docs = canonical_docs(staged.select(*turn_cols)).withColumn(
            "bucket", _bucket_col(n_buckets)
        )
        # (3) dynamic partition overwrite: only partitions present in `docs`
        # (== the touched buckets) are replaced; the rest are untouched
        (
            docs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(docs_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# custom stateful operator: incremental per-conversation turn accounting
# ---------------------------------------------------------------------------

TURNSTATE_OUTPUT = "conv_id string, n_turns long, max_turn_idx int"
TURNSTATE_STATE = "n long, mx int"


def stateful_turn_counts(stream: DataFrame):
    """Streaming per-conversation turn counter via ``applyInPandasWithState``.

    Maintains (count, max turn_idx) per conv_id across micro-batches with
    checkpointed state — the Structured Streaming pattern for custom stateful
    ER maintenance (e.g. "re-block a conversation once it has enough turns").
    Emits one updated row per touched conv per batch (append-mode compatible
    with file sinks; the latest row per conv is the current state).
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout  # noqa: PLC0415

    def update(key, pdfs, state: GroupState):
        n, mx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                mx = max(mx, int(pdf["turn_idx"].max()))
        state.update((n, mx))
        yield pd.DataFrame(
            {"conv_id": [key[0]], "n_turns": [n], "max_turn_idx": [mx]}
        )

    return stream.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=TURNSTATE_OUTPUT,
        stateStructType=TURNSTATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
