"""Threshold-sweep precision/recall (distributed analogue of reference C6)."""

import pytest

from entityresolution_capstone_spark.evaluate import precision_recall_sweep


def test_sweep_golden(spark):
    labels = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 2), ("d", 2)], ["conv_id", "entity_id"]
    )
    scored = spark.createDataFrame(
        [
            ("a", "b", 0.9),   # true match, high score
            ("c", "d", 0.6),   # true match, mid score
            ("a", "c", 0.7),   # non-match, mid score
            ("b", "d", 0.1),   # non-match, low score
        ],
        ["id1", "id2", "sim"],
    )
    out = {
        r["threshold"]: r
        for r in precision_recall_sweep(scored, labels, [0.5, 0.8]).collect()
    }
    r5 = out[0.5]
    assert (r5["tp"], r5["fp"], r5["fn"]) == (2, 1, 0)
    assert r5["precision"] == pytest.approx(2 / 3)
    assert r5["recall"] == 1.0
    r8 = out[0.8]
    assert (r8["tp"], r8["fp"], r8["fn"]) == (1, 0, 1)
    assert r8["precision"] == 1.0
    assert r8["recall"] == 0.5
