"""Connected-components (large-star/small-star) correctness tests.

Oracle: a tiny in-test union-find (pure Python) — independent of the Spark
implementation. Random graphs via hypothesis-style seeds (deterministic numpy).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from entityresolution_capstone_spark.operators.cc import (
    assign_clusters,
    connected_components,
)


def uf_components(n_nodes, edge_list):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # label by min member id
    groups = {}
    for i in range(n_nodes):
        groups.setdefault(find(i), []).append(i)
    out = {}
    for members in groups.values():
        root = min(members)
        for m in members:
            out[m] = root
    return out


def _ids(i):
    return f"n{i:05d}"


@pytest.mark.parametrize("seed,n,m", [(0, 30, 20), (1, 200, 150), (2, 100, 300)])
def test_cc_matches_union_find(spark, seed, n, m):
    rng = np.random.Generator(np.random.PCG64(seed))
    edges = [(int(rng.integers(0, n)), int(rng.integers(0, n))) for _ in range(m)]
    edges = [(a, b) for a, b in edges if a != b]
    want = uf_components(n, edges)

    edf = spark.createDataFrame(
        [(_ids(min(a, b)), _ids(max(a, b))) for a, b in edges], ["id1", "id2"]
    )
    all_ids = spark.createDataFrame([(_ids(i),) for i in range(n)], ["conv_id"])
    got = {
        r["conv_id"]: r["cluster_id"]
        for r in assign_clusters(all_ids, connected_components(edf, checkpoint=False)).collect()
    }
    for i in range(n):
        assert got[_ids(i)] == _ids(want[i]), f"node {i}"


def test_cc_chain_and_singletons(spark):
    # a long path (worst case for naive propagation) + isolated nodes
    n = 64
    edf = spark.createDataFrame(
        [(_ids(i), _ids(i + 1)) for i in range(n - 1)], ["id1", "id2"]
    )
    all_ids = spark.createDataFrame(
        [(_ids(i),) for i in range(n + 5)], ["conv_id"]
    )
    got = assign_clusters(all_ids, connected_components(edf, checkpoint=False))
    rows = got.collect()
    labels = {r["conv_id"]: r["cluster_id"] for r in rows}
    for i in range(n):
        assert labels[_ids(i)] == _ids(0)
    for i in range(n, n + 5):
        assert labels[_ids(i)] == _ids(i)  # singletons keep their own id


def test_cc_deterministic(spark):
    rng = np.random.Generator(np.random.PCG64(9))
    edges = [
        (int(rng.integers(0, 50)), int(rng.integers(0, 50))) for _ in range(60)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    edf = spark.createDataFrame(
        [(_ids(a), _ids(b)) for a, b in edges], ["id1", "id2"]
    )
    r1 = sorted(connected_components(edf, checkpoint=False).collect())
    r2 = sorted(connected_components(edf.repartition(7), checkpoint=False).collect())
    assert r1 == r2
