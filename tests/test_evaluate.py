"""Metric golden tests pinned to the reference's 5-node fixture.

/root/reference/tests/test_core.py:11-38: labels {1:1,2:1,3:2,4:3,5:3},
preds {4:1001,3:1000,1:1000,2:1000,5:1010} -> P=0.33, R=0.5, F1=0.4,
AMI=0.23, V=0.67 (2 dp).
"""

import pytest

from entityresolution_capstone_spark import evaluate as E


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    labels = spark.createDataFrame(
        [("1", 1), ("2", 1), ("3", 2), ("4", 3), ("5", 3)], ["conv_id", "entity_id"]
    )
    preds = spark.createDataFrame(
        [("4", "1001"), ("3", "1000"), ("1", "1000"), ("2", "1000"), ("5", "1010")],
        ["conv_id", "cluster_id"],
    )
    return labels, preds


def test_pairwise_precision_recall_golden(fixture_dfs):
    labels, preds = fixture_dfs
    s = E.pairwise_precision_recall(labels, preds)
    assert round(s.precision, 2) == 0.33
    assert round(s.recall, 2) == 0.5
    assert round(s.f1, 2) == 0.4


def test_ami_golden(fixture_dfs):
    labels, preds = fixture_dfs
    assert round(E.ami_score(labels, preds), 2) == 0.23


def test_v_measure_golden(fixture_dfs):
    labels, preds = fixture_dfs
    assert round(E.v_measure_score(labels, preds), 2) == 0.67


def test_perfect_clustering(fixture_dfs):
    labels, _ = fixture_dfs
    preds = labels.selectExpr("conv_id", "cast(entity_id as string) as cluster_id")
    s = E.pairwise_precision_recall(labels, preds)
    assert s.precision == 1.0 and s.recall == 1.0 and s.f1 == 1.0
    assert E.ami_score(labels, preds) == pytest.approx(1.0)
    assert E.v_measure_score(labels, preds) == pytest.approx(1.0)


def test_blocking_quality_golden(spark):
    from entityresolution_capstone_spark.evaluate import blocking_quality

    labels = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1), ("d", 2), ("e", 2)],
        "conv_id string, entity_id int",
    )
    cand = spark.createDataFrame(
        [("a", "b"), ("a", "d"), ("d", "e")], "id1 string, id2 string"
    )
    r = blocking_quality(cand, labels).collect()[0]
    # n=5 -> C(5,2)=10 total; true pairs C(3,2)+C(2,2)=4; covered (a,b),(d,e)
    assert r.n_records == 5 and r.n_candidates == 3
    assert r.n_true_pairs == 4 and r.n_covered == 2
    assert r.reduction_ratio == 0.7
    assert r.pair_completeness == 0.5
    assert r.pair_quality == 0.666667


def test_cluster_drift_golden(spark):
    from entityresolution_capstone_spark.evaluate import cluster_drift

    a = spark.createDataFrame(
        [("1", "x"), ("2", "x"), ("3", "y"), ("4", "y"), ("5", "z"), ("6", "w")],
        "conv_id string, cluster_id string",
    )
    b = spark.createDataFrame(
        [("1", "p"), ("2", "p"), ("3", "q"), ("4", "r"), ("5", "r"), ("6", "s")],
        "conv_id string, cluster_id string",
    )
    r = cluster_drift(a, b).collect()[0]
    # x->{p} whole (stable), y splits into {q,r}, z lands inside r (r also
    # holds a y member -> merged), w->{s} stable.
    assert r.n_records == 6
    assert r.n_clusters_a == 4 and r.n_clusters_b == 4
    assert r.n_stable == 2 and r.n_split == 1 and r.n_merged == 1
    # pairs(A)={12,34}, pairs(B)={12,45}, both={12} -> 1/3
    assert r.pair_jaccard == 0.333333


def test_cluster_drift_identical(spark):
    from entityresolution_capstone_spark.evaluate import cluster_drift

    a = spark.createDataFrame(
        [("1", "x"), ("2", "x"), ("3", "y")], "conv_id string, cluster_id string"
    )
    r = cluster_drift(a, a).collect()[0]
    assert r.n_stable == 2 and r.n_split == 0 and r.n_merged == 0
    assert r.pair_jaccard == 1.0


def test_bcubed_golden(fixture_dfs):
    # Hand-computed on the 5-node fixture:
    # P(1)=P(2)=2/3, P(3)=1/3, P(4)=P(5)=1 -> B3P = 11/15
    # R(1)=R(2)=R(3)=1, R(4)=R(5)=1/2     -> B3R = 4/5
    labels, preds = fixture_dfs
    row = E.bcubed(labels, preds).collect()[0]
    assert row["n_records"] == 5
    assert row["bcubed_precision"] == pytest.approx(11 / 15, abs=2e-6)
    assert row["bcubed_recall"] == pytest.approx(0.8, abs=2e-6)
    assert row["bcubed_f1"] == pytest.approx(0.765217, abs=2e-6)


def test_bcubed_perfect_and_singletons(fixture_dfs):
    labels, _ = fixture_dfs
    perfect = labels.selectExpr("conv_id", "cast(entity_id as string) as cluster_id")
    row = E.bcubed(labels, perfect).collect()[0]
    assert (row["bcubed_precision"], row["bcubed_recall"], row["bcubed_f1"]) == (
        1.0,
        1.0,
        1.0,
    )
    # all-singleton preds: precision 1, recall = mean(1/|L(e)|) = (4*(1/2)+1)/5
    singles = labels.selectExpr("conv_id", "conv_id as cluster_id")
    row = E.bcubed(labels, singles).collect()[0]
    assert row["bcubed_precision"] == 1.0
    assert row["bcubed_recall"] == pytest.approx(0.6, abs=2e-6)


def test_bcubed_dispatch(fixture_dfs):
    labels, preds = fixture_dfs
    p, r, f1 = E.evaluate(labels, preds, strategy="bcubed")
    assert r == pytest.approx(0.8, abs=2e-6)
