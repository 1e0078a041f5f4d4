"""Canonical schemas for every table the pipeline reads or writes.

The input shape is fixed by the task's input hint (BASELINE.json:15): an
Iceberg-style table of multi-turn conversation / agent transcripts. The
reference's dynamic ``attr_dict`` schema (``/root/reference/src/entity_resolver/
core/graph.py:113-168``) is replaced by these static StructTypes so Catalyst
can prune/push down into the scans.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input: one row per conversation turn.
TRANSCRIPTS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Ground truth: conversation -> true entity id
# (mirrors /root/reference/src/entity_resolver/parser/ground_truth_parser.py:38-41).
LABELS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("entity_id", T.LongType(), False),
    ]
)

# Canonical per-conversation documents (stage 1 output).
CANONICAL_DOCS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("doc", T.StringType(), True),
        T.StructField("tokens", T.ArrayType(T.StringType()), True),
        T.StructField("n_turns", T.IntegerType(), True),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
    ]
)

# Blocking keys (stage 2 output).
BLOCKS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("block_key", T.StringType(), False),
    ]
)

# Candidate pairs (stage 3 output); unordered pair with id1 < id2.
CANDIDATE_PAIRS = T.StructType(
    [
        T.StructField("id1", T.StringType(), False),
        T.StructField("id2", T.StringType(), False),
    ]
)

# Scored pairs (stage 4 output).
SCORED_PAIRS = T.StructType(
    [
        T.StructField("id1", T.StringType(), False),
        T.StructField("id2", T.StringType(), False),
        T.StructField("sim", T.DoubleType(), True),
    ]
)

# Cluster assignment (final output; mirrors the reference's
# OrderedDict[node_id -> cluster_id], resolver.py:339-345, as a sorted table).
CLUSTERS = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("cluster_id", T.StringType(), False),
    ]
)

# Per-stage lineage/metrics rows (north rule: per-partition lineage + metrics).
STAGE_METRICS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("wall_ms", T.LongType(), True),
        T.StructField("extra", T.StringType(), True),
    ]
)
