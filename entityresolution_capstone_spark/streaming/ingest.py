"""Structured-streaming transcript ingest (incremental canonicalization).

The reference has no streaming surface at all (SURVEY.md §2.10) — this is new
Spark-native capability required for a live transcript feed:

- ``readStream`` over a growing directory of transcript parquet/json files;
- watermark on ``ts`` + ``dropDuplicates`` on (conv_id, turn_idx) inside the
  watermark: late duplicate turns (at-least-once upstreams) are dropped;
- ``foreachBatch`` upsert: each micro-batch appends its turns to a staging
  table and re-canonicalizes ONLY the conversations it touched (incremental
  maintenance — a conversation's doc is a pure function of its turns, so
  rebuilding touched convs from staging is exactly-once w.r.t. the sink).

Run with ``trigger(availableNow=True)`` for backfills; continuous triggers for
live feeds. State size is bounded by the watermark horizon.
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
        .dropDuplicates(["conv_id", "turn_idx"])
    )


def start_ingest(
    spark: SparkSession,
    input_dir: str,
    staging_dir: str,
    docs_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Start (and return) the streaming query. Caller awaits termination."""
    stream = read_transcript_stream(spark, input_dir)

    def upsert(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        batch.persist()
        batch.write.mode("append").parquet(staging_dir)
        touched = [r["conv_id"] for r in batch.select("conv_id").distinct().collect()]
        staged = spark.read.parquet(staging_dir).filter(F.col("conv_id").isin(touched))
        docs = canonical_docs(staged)
        # overwrite only the touched convs' doc partitions (tiny dynamic set)
        if os.path.exists(docs_dir):
            existing = spark.read.parquet(docs_dir).filter(
                ~F.col("conv_id").isin(touched)
            )
            docs = existing.unionByName(docs)
        docs.write.mode("overwrite").parquet(docs_dir + ".tmp")
        tmp = spark.read.parquet(docs_dir + ".tmp")
        tmp.write.mode("overwrite").parquet(docs_dir)
        batch.unpersist()

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
