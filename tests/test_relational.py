"""Relational kernel golden tests — the reference's 8-node/4-edge fixture.

/root/reference/tests/test_core.py:116-135,169-201: clusters
{1:{1,3}, 2:{2,5,7}, 3:{4}, 4:{6,8}} with injected neighbor multisets
  1: [1,2,1,3]   2: [2,1,2,4,2,4]   3: [4,1]   4: [4,2,4,2]
Expected for cluster pair (1,2): jaccard=0.5, jaccard_fr=0.25,
adar_neighbor≈0.45 (2dp), adar_neighbor_fr≈0.233 (3dp).
"""

import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.functions import relational as R

NBRS = (
    [("1", n) for n in ["1", "2", "1", "3"]]
    + [("2", n) for n in ["2", "1", "2", "4", "2", "4"]]
    + [("3", n) for n in ["4", "1"]]
    + [("4", n) for n in ["4", "2", "4", "2"]]
)


@pytest.fixture(scope="module")
def tables(spark):
    nbrs = spark.createDataFrame(NBRS, ["cluster", "nbr"])
    pairs = spark.createDataFrame([("1", "2")], ["c1", "c2"])
    return nbrs, pairs


def _score(pairs, nbrs, strategy, uniqueness=None):
    return R.rel_sim_pairs(pairs, nbrs, strategy, uniqueness=uniqueness).collect()[0][
        "rel_sim"
    ]


def test_jaccard_golden(tables):
    nbrs, pairs = tables
    assert _score(pairs, nbrs, "jaccard_coef") == 0.5


def test_jaccard_fr_golden(tables):
    nbrs, pairs = tables
    assert _score(pairs, nbrs, "jaccard_coef_fr") == 0.25


def test_adar_neighbor_golden(tables):
    nbrs, pairs = tables
    assert round(_score(pairs, nbrs, "adar_neighbor"), 2) == 0.45


def test_adar_neighbor_fr_golden(tables):
    nbrs, pairs = tables
    assert round(_score(pairs, nbrs, "adar_neighbor_fr"), 3) == 0.233


def test_cluster_neighbors_includes_self(spark):
    """get_neighbors includes the node itself (reference graph.py:288-298),
    so each cluster always neighbors itself via its own members."""
    clusters = spark.createDataFrame(
        [("a", "ca"), ("b", "cb")], ["conv_id", "cluster_id"]
    )
    edges = spark.createDataFrame([("a", 1), ("b", 1)], ["conv_id", "edge_id"])
    nbrs = R.cluster_neighbors(clusters, edges)
    got = {(r["cluster"], r["nbr"]) for r in nbrs.collect()}
    assert ("ca", "ca") in got and ("ca", "cb") in got
    assert ("cb", "cb") in got and ("cb", "ca") in got


def test_attr_uniqueness(spark):
    """amb(r) = |distinct a2 sharing a1| / |R| (graph.py:300-347); u = 1/avg."""
    docs = spark.createDataFrame(
        [("r1", "wang", "w"), ("r2", "wang", "x"), ("r3", "li", "y"), ("r4", "li", "y")],
        ["conv_id", "last", "first"],
    )
    clusters = spark.createDataFrame(
        [("r1", "k1"), ("r2", "k1"), ("r3", "k2"), ("r4", "k2")],
        ["conv_id", "cluster_id"],
    )
    u = {r["cluster"]: r["uniq"] for r in R.attr_uniqueness(docs, clusters, "last", "first").collect()}
    # wang: 2 distinct firsts / 4 refs = 0.5 ambiguity -> uniq 2.0
    # li: 1 distinct first / 4 = 0.25 -> uniq 4.0
    assert u["k1"] == pytest.approx(2.0)
    assert u["k2"] == pytest.approx(4.0)
