"""Stage 4 — relational bootstrapping: high-precision seed edges.

Mirrors the reference's pre-clustering (/root/reference/src/entity_resolver/
core/resolver.py:378-504):

- exact match (R1, resolver.py:444-475): two references whose attributes are
  all equal seed the same cluster. Distributed form: group on a hash of the
  canonical attribute tuple — every doc in a group links to the group's min id
  (star edges), exactly the union-find result of pairwise unions.
- edge match (R2, resolver.py:477-504): additionally require >= k exactly-
  matching *neighbor* pairs across the two references' hyper-edges. Expressed
  as candidate-pairs ⋈ neighbors ⋈ exact-match-groups -> count per pair.
- negative constraint (resolver.py:536-541): co-occurring references (same
  hyper-edge) must NOT merge -> an anti-join on the co-occurrence pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_match_edges(
    docs: DataFrame, match_cols: list[str] | None = None
) -> DataFrame:
    """Star edges (id1, id2) linking every doc to the min conv_id of its
    exact-match group. O(n) edges instead of O(group²)."""
    match_cols = match_cols or ["doc"]
    # group on the ACTUAL attribute tuple (struct key), not a 64-bit hash of
    # it: at 10^12 rows birthday-bound xxhash64 collisions are expected in the
    # thousands, and one colliding seed edge gets amplified by transitive
    # closure into a wrongly merged cluster. Struct equality is null-safe
    # (null fields compare equal). Spark still hash-partitions the shuffle on
    # the struct internally -- same shuffle shape, no correctness gamble.
    key = F.struct(*[F.col(c) for c in match_cols])
    grouped = docs.select(F.col("conv_id"), key.alias("_k"))
    reps = grouped.groupBy("_k").agg(
        F.min("conv_id").alias("id1"), F.count("*").alias("_n")
    )
    # no broadcast hint: the duplicate-group table is data-dependent in size
    # (can be O(n) at web scale); AQE picks broadcast when it actually fits
    return (
        grouped.join(reps.filter(F.col("_n") > 1), "_k")
        .filter(F.col("conv_id") != F.col("id1"))
        .select("id1", F.col("conv_id").alias("id2"))
    )


def edge_match_filter(
    pairs: DataFrame,
    edges: DataFrame,
    exact_groups: DataFrame,
    k: int = 1,
    id_col: str = "conv_id",
) -> DataFrame:
    """Keep pairs with >= k exactly-matching neighbor pairs (R2 semantics).

    ``edges``: (id, edge_id) hyper-edge membership. ``exact_groups``: (id,
    group) exact-match group per reference. A neighbor pair (n1, n2) matches
    iff group(n1) == group(n2), excluding the pair itself (resolver.py:497-499).
    """
    nbr = edges.select(F.col(id_col).alias("_m"), "edge_id").join(
        edges.select(F.col(id_col).alias("_n"), "edge_id"), "edge_id"
    ).select("_m", "_n")
    g = exact_groups
    n1 = (
        nbr.withColumnRenamed("_m", "id1").withColumnRenamed("_n", "nb1")
        .join(g.select(F.col(id_col).alias("nb1"), F.col("group").alias("g1")), "nb1")
    )
    n2 = (
        nbr.withColumnRenamed("_m", "id2").withColumnRenamed("_n", "nb2")
        .join(g.select(F.col(id_col).alias("nb2"), F.col("group").alias("g2")), "nb2")
    )
    matches = (
        pairs.join(n1, "id1")
        .join(n2, "id2")
        .filter(
            (F.col("g1") == F.col("g2"))
            & ~((F.col("nb1") == F.col("id1")) & (F.col("nb2") == F.col("id2")))
            & ~((F.col("nb1") == F.col("id2")) & (F.col("nb2") == F.col("id1")))
        )
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("_matches"))
        .filter(F.col("_matches") >= k)
        .select("id1", "id2")
    )
    return matches


def negative_constraint_filter(
    pairs: DataFrame, edges: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """Drop pairs whose two sides co-occur in one hyper-edge (anti-join).

    Reference rationale: co-occurring references are distinct by construction
    (advanced_guide.rst:87-92) — e.g. two co-authors of one paper.
    """
    co = (
        edges.select(F.col(id_col).alias("id1"), "edge_id")
        .join(edges.select(F.col(id_col).alias("id2"), "edge_id"), "edge_id")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    return pairs.join(co, ["id1", "id2"], "left_anti")
