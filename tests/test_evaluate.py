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
