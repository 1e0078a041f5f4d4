"""Bootstrap (exact/edge match, negative constraint) + salted pair generation."""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators import blocking as B
from entityresolution_capstone_spark.operators import bootstrap as BS


def test_exact_match_edges_star_shape(spark):
    docs = spark.createDataFrame(
        [("a", "x y"), ("b", "x y"), ("c", "x y"), ("d", "other"), ("e", "solo")],
        ["conv_id", "doc"],
    )
    edges = BS.exact_match_edges(docs, ["doc"])
    got = sorted((r["id1"], r["id2"]) for r in edges.collect())
    # star: everyone links to min id of the group; singletons emit nothing
    assert got == [("a", "b"), ("a", "c")]


def test_edge_match_filter_semantics(spark):
    """R2 (resolver.py:477-504): pair passes iff >= k exactly-matching
    neighbor pairs across the two hyper-edges, excluding the pair itself."""
    # hyper-edges: e1 = {a1, b1}, e2 = {a2, b2}; exact groups: a1~a2, b1~b2
    edges = spark.createDataFrame(
        [("a1", 1), ("b1", 1), ("a2", 2), ("b2", 2)], ["conv_id", "edge_id"]
    )
    groups = spark.createDataFrame(
        [("a1", "ga"), ("a2", "ga"), ("b1", "gb"), ("b2", "gb")],
        ["conv_id", "group"],
    )
    pairs = spark.createDataFrame([("a1", "a2")], ["id1", "id2"])
    # neighbors of a1 include b1; neighbors of a2 include b2; b1~b2 match
    out = BS.edge_match_filter(pairs, edges, groups, k=1)
    assert [(r["id1"], r["id2"]) for r in out.collect()] == [("a1", "a2")]
    # raise k beyond available matches -> filtered out
    out2 = BS.edge_match_filter(pairs, edges, groups, k=5)
    assert out2.count() == 0


def test_edge_match_excludes_self_pair(spark):
    """The candidate pair itself must not count as a matching neighbor pair."""
    edges = spark.createDataFrame(
        [("a1", 1), ("a2", 2)], ["conv_id", "edge_id"]
    )
    groups = spark.createDataFrame(
        [("a1", "ga"), ("a2", "ga")], ["conv_id", "group"]
    )
    pairs = spark.createDataFrame([("a1", "a2")], ["id1", "id2"])
    # the only matching neighbor pair is (a1, a2) itself -> excluded -> fails k=1
    assert BS.edge_match_filter(pairs, edges, groups, k=1).count() == 0


def test_negative_constraint(spark):
    """Co-occurring references must not merge (resolver.py:536-541)."""
    edges = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2)], ["conv_id", "edge_id"]
    )
    pairs = spark.createDataFrame([("a", "b"), ("a", "c")], ["id1", "id2"])
    out = BS.negative_constraint_filter(pairs, edges)
    assert [(r["id1"], r["id2"]) for r in out.collect()] == [("a", "c")]


def test_salted_pairs_complete_vs_naive(spark):
    """Salted sub-bucket enumeration must produce exactly the naive pair set."""
    rows = [(f"blk{i % 3}", f"n{j:03d}") for i in range(3) for j in range(40)]
    # build: 3 blocks x 40 members each (overlapping members across blocks)
    blocks = spark.createDataFrame(
        [(f"blk{i}", f"n{j:03d}") for i in range(3) for j in range(40)],
        ["block_key", "conv_id"],
    )
    naive = (
        blocks.alias("a")
        .join(blocks.alias("b"), "block_key")
        .filter(F.col("a.conv_id") < F.col("b.conv_id"))
        .select(
            F.col("a.conv_id").alias("id1"), F.col("b.conv_id").alias("id2")
        )
        .distinct()
    )
    salted = B.salted_pairs(blocks, g=4).distinct()
    assert salted.exceptAll(naive).count() == 0
    assert naive.exceptAll(salted).count() == 0


def test_candidate_pairs_with_salting_matches_plain(spark):
    blocks = spark.createDataFrame(
        [("hot", f"n{j:03d}") for j in range(60)]
        + [("cold", f"n{j:03d}") for j in range(5)],
        ["block_key", "conv_id"],
    )
    plain = B.candidate_pairs(blocks, B.BlockingConfig(max_block_size=100))
    salted = B.candidate_pairs(
        blocks,
        B.BlockingConfig(max_block_size=100, salt_block_size=20, salt_factor=4),
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
