"""Relational (neighborhood) similarity kernels as DataFrame algebra.

Behavioral parity with the reference's relational kernels
(/root/reference/src/entity_resolver/core/utils.py:456-637, selected at
resolver.py:910-939), re-expressed as distributed joins + aggregations:

- ``jaccard_coef``       |N1 ∩ N2| / |N1 ∪ N2| over neighbor-cluster *sets*
- ``jaccard_coef_fr``    multiset variant: Σ min(c1,c2) / Σ max(c1,c2)
- ``adar_neighbor[_fr]`` uniqueness-weighted: Σ_∩ u(c) / Σ_∪ u(c) with
  ``u(c) = 1 / (1 + ln(n_c))`` where ``n_c`` is the *distinct* neighbor count
  for set strategies and the *multiset* size for ``_fr`` strategies
  (resolver.py:1064-1071 + the `_use_nbr_cache` switch at resolver.py:926-929;
  both behaviors pinned by /root/reference/tests/test_core.py:195-198).
- ``adar_attr[_fr]``     u(c) = 1 / mean(ambiguity of members) with
  per-reference ambiguity amb(r) = |distinct a2 among refs sharing a1(r)| / |R|
  (graph.py:300-347).

Inputs are plain tables, so every kernel is one union + one groupBy —
map-side-combinable, skew handled by AQE on the pair key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_neighbors(
    clusters: DataFrame, edges: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """Multiset neighbor table (cluster, nbr_cluster) with multiplicity rows.

    ``clusters``: (id, cluster_id); ``edges``: (id, edge_id) hyper-edge
    membership. A node's neighbors are all co-members of its hyper-edge,
    *including itself* (reference graph.py:288-298) — so the self cluster
    always appears.
    """
    e1 = edges.select(F.col(id_col).alias("_a"), "edge_id")
    e2 = edges.select(F.col(id_col).alias("_b"), "edge_id")
    c_a = clusters.select(F.col(id_col).alias("_a"), F.col("cluster_id").alias("cluster"))
    c_b = clusters.select(F.col(id_col).alias("_b"), F.col("cluster_id").alias("nbr"))
    return (
        e1.join(e2, "edge_id")
        .join(c_a, "_a")
        .join(c_b, "_b")
        .select("cluster", "nbr")
    )


def _pair_intersection_and_totals(
    pairs: DataFrame,
    counts: DataFrame,
    w_inter,
    w_total,
    c1: str = "c1",
    c2: str = "c2",
):
    """(pair-intersection sums, per-cluster totals) for the sparse identity
    ``union_sum = total1 + total2 - inter_sum``.

    The naive formulation materializes one row per (pair, UNION-neighbor) —
    O(pairs x union size), the dominant intermediate at high edge density
    (measured ~10 min for the adar query at sf0.1). Only the INTERSECTION
    rows are actually needed: ``counts ⋈ counts`` on the neighbor key yields
    exactly the shared-neighbor rows, and per-cluster totals are a
    cluster-cardinality aggregate. ``w_inter(cnt1, cnt2, u)`` scores one
    shared neighbor; ``w_total(cnt, u)`` scores one (cluster, nbr) row.
    """
    a = counts.select(
        F.col("cluster").alias(c1), "nbr", F.col("cnt").alias("cnt1"), "uniq"
    )
    b = counts.select(
        F.col("cluster").alias(c2), "nbr", F.col("cnt").alias("cnt2")
    )
    inter = (
        a.join(b, "nbr")
        .filter(F.col(c1) < F.col(c2))
        .groupBy(c1, c2)
        .agg(
            F.sum(w_inter(F.col("cnt1"), F.col("cnt2"), F.col("uniq"))).alias("_is")
        )
        # score only the requested pairs (callers may pre-filter the universe)
        .join(pairs.select(c1, c2), [c1, c2], "left_semi")
    )
    totals = counts.groupBy("cluster").agg(
        F.sum(w_total(F.col("cnt"), F.col("uniq"))).alias("_t")
    )
    return inter, totals


def neighbor_uniqueness(nbrs: DataFrame, multiset: bool) -> DataFrame:
    """(cluster=nbr key, uniq) with u = 1/(1+ln(n)); n per the strategy flavor."""
    agg = F.count("*") if multiset else F.count_distinct("nbr")
    return nbrs.groupBy("cluster").agg(
        (F.lit(1.0) / (F.lit(1.0) + F.log(agg.cast("double")))).alias("uniq")
    )


def attr_uniqueness(
    docs: DataFrame,
    clusters: DataFrame,
    a1: str,
    a2: str,
    id_col: str = "conv_id",
) -> DataFrame:
    """adar_attr uniqueness: 1 / mean(ambiguity) per cluster.

    amb(r) = countDistinct(a2 over refs sharing a1(r)) / |R|
    — two aggregations + a broadcast join back on a1 (graph.py:300-347).
    """
    n_total = docs.count()
    amb_by_a1 = (
        docs.groupBy(a1)
        .agg((F.count_distinct(a2) / F.lit(float(n_total))).alias("amb"))
    )
    per_ref = docs.select(id_col, a1).join(F.broadcast(amb_by_a1), a1)
    return (
        per_ref.join(clusters, id_col)
        .groupBy(F.col("cluster_id").alias("cluster"))
        .agg((F.lit(1.0) / F.avg("amb")).alias("uniq"))
    )


def rel_sim_pairs(
    pairs: DataFrame,
    nbrs: DataFrame,
    strategy: str = "jaccard_coef",
    uniqueness: DataFrame | None = None,
    c1: str = "c1",
    c2: str = "c2",
) -> DataFrame:
    """Score cluster pairs with the chosen relational kernel -> (c1, c2, rel_sim).

    ``uniqueness`` is required for adar_attr[_fr]; for adar_neighbor[_fr] it is
    derived from ``nbrs`` with the strategy-correct set/multiset counting.

    Every kernel is a ratio of weighted intersection over weighted union;
    the union sum is computed with the sparse-similarity identity
    ``sum_union = total(c1) + total(c2) - sum_inter`` so only the shared-
    neighbor rows are ever materialized (counts self-join on the neighbor
    key) plus one cluster-cardinality totals table — never a row per
    (pair, union-neighbor). Pairs in ``pairs`` with no shared neighbor are
    not returned (their score is 0; callers that need them left-join with
    coalesce(0.0), as operators/iterative.py does). ``pairs`` must be in
    canonical order (``c1 < c2``, as every pair-enumeration operator here
    emits): the intersection self-join keeps only canonical orientations, so
    a reversed pair would silently score as absent.
    """
    multiset = strategy.endswith("_fr")
    counts = nbrs.groupBy("cluster", "nbr").agg(F.count("*").alias("cnt"))
    if strategy in ("jaccard_coef", "jaccard_coef_fr"):
        counts = counts.withColumn("uniq", F.lit(1.0))
    elif strategy in ("adar_neighbor", "adar_neighbor_fr", "adar_attr", "adar_attr_fr"):
        if uniqueness is None:
            if strategy.startswith("adar_attr"):
                raise ValueError("adar_attr strategies need an explicit uniqueness table")
            uniqueness = neighbor_uniqueness(nbrs, multiset=multiset)
        counts = counts.join(
            F.broadcast(uniqueness.withColumnRenamed("cluster", "nbr")), "nbr"
        )
    else:
        raise ValueError(f"unknown relational strategy: {strategy}")

    if multiset:
        w_inter = lambda a, b, u: F.least(a, b).cast("double") * u  # noqa: E731
        w_total = lambda c, u: c.cast("double") * u  # noqa: E731
    else:
        w_inter = lambda a, b, u: u  # noqa: E731
        w_total = lambda c, u: u  # noqa: E731
    inter, totals = _pair_intersection_and_totals(
        pairs, counts, w_inter, w_total, c1, c2
    )
    t1 = totals.select(F.col("cluster").alias(c1), F.col("_t").alias("_t1"))
    t2 = totals.select(F.col("cluster").alias(c2), F.col("_t").alias("_t2"))
    return (
        inter.join(t1, c1)
        .join(t2, c2)
        .select(
            c1,
            c2,
            (
                F.col("_is") / (F.col("_t1") + F.col("_t2") - F.col("_is"))
            ).alias("rel_sim"),
        )
    )
