"""Stage 5 — transitive clustering: large-star / small-star connected components.

Replaces the reference's driver-side agglomerative loop + indexed heap
(/root/reference/src/entity_resolver/core/resolver.py:506-555, utils.py:923-1085)
with the large-star/small-star map-reduce connected-components algorithm
(Rastogi, Machanavajjhala, Chitnis & Das Sarma, "Finding Connected Components
in Map-Reduce in Logarithmic Rounds", ICDE 2013 — PAPERS.md) — the algorithm
the north rule names. With the reference's default α=0 (attribute-only scoring,
resolver.py:236) thresholded-pairs + transitive closure is semantically
equivalent to max-linkage agglomerative merging with a similarity threshold:
max-linkage merges exactly the transitive closure of node pairs ≥ θ.

Each round:
  large-star: for every node u, connect its strictly-larger neighbors to
              m(u) = min(Γ(u) ∪ {u})
  small-star: for every node u, connect its smaller-or-equal neighbors and
              itself to m⁻(u) = min over {v ∈ Γ(u): v <= u} ∪ {u}

Converges in O(log n) rounds; every round is two self-contained
groupBy/join stages. The frontier DataFrame is **checkpointed** each round
(north rule: checkpointed frontier DataFrames) — truncating lineage is what
keeps round k from re-running rounds 0..k-1.

Labels are ``min(conv_id)`` per component -> deterministic output
(FIXTURES.md invariant: two runs, identical assignments).
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TRACE = os.environ.get("ERCS_CC_TRACE", "") == "1"


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize an undirected edge list to directed (u, v) both ways."""
    return edges.select(F.col("id1").alias("u"), F.col("id2").alias("v")).unionByName(
        edges.select(F.col("id2").alias("u"), F.col("id1").alias("v"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(u,v) directed both ways -> edges (v, m(u)) for v > u."""
    nbrs = edges  # symmetric
    m = (
        nbrs.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least("_mv", F.col("u")).alias("m"))
    )
    return (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("id1"), F.col("m").alias("id2"))
        .filter(F.col("id1") != F.col("id2"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """directed (u,v) with v <= u -> edges (v, m(u)) plus (u, m(u))."""
    smaller = edges.filter(F.col("v") < F.col("u"))
    m = smaller.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        smaller.join(m, "u")
        .select(F.col("v").alias("id1"), F.col("m").alias("id2"))
        .unionByName(m.select(F.col("u").alias("id1"), F.col("m").alias("id2")))
        .filter(F.col("id1") != F.col("id2"))
        .distinct()
    )
    return out


def connected_components(
    edges: DataFrame,
    max_iterations: int = 25,
    checkpoint: bool | None = None,
    probe_every: int = 2,
) -> DataFrame:
    """Edge list (id1, id2) -> component assignment (conv_id, cluster_id).

    ``cluster_id`` = min node id of the component. Only nodes that appear in
    an edge are returned; callers union in singletons (see
    :func:`assign_clusters`).

    Every round materializes + truncates lineage (without truncation round k
    re-plans rounds 0..k-1 as one exponentially nested join tree).
    ``checkpoint=None`` (default) picks the storage automatically:

    - off ``local[*]`` masters: RELIABLE ``checkpoint`` to the configured
      checkpoint dir — ``localCheckpoint`` stores blocks on executors, so an
      executor loss mid-iteration kills the whole job at cluster scale
      (VERDICT r2 item 4);
    - on ``local[*]``: ``localCheckpoint`` (no executor-loss mode exists, and
      the HDFS round-trip is pure overhead).

    Convergence is probed every ``probe_every`` rounds (count + xor-hash of
    the edge set, one tiny job over the just-materialized frontier): the
    large-star/small-star map is deterministic and provably convergent
    (Rastogi et al., ICDE'13), so a repeated state IS the fixpoint —
    probing less often halves the per-round driver barriers without
    changing the result.
    """
    if checkpoint is None:
        checkpoint = not edges.sparkSession.conf.get("spark.master", "local").startswith(
            "local"
        )
    cur = (
        edges.select("id1", "id2")
        .filter(F.col("id1") != F.col("id2"))
        .distinct()
    )
    # materialize the input once: each round reads `cur` from several branches
    # (groupBy + join on both sides of the self-join)
    cur = cur.checkpoint(eager=True) if checkpoint else cur.localCheckpoint(eager=True)
    # Scale-adaptive round partitioning (r6, guide §2.2/§6): each round is
    # ~6 shuffle stages over the frontier, and the frontier is usually tiny
    # relative to the pair stream that produced it (thresholded edges). At
    # the session default (one partition per core) every round schedules
    # cores x stages near-empty tasks whose fixed costs dominate the round —
    # measured at sf0.1/local[32]: 63k-edge rounds ran 32-task stages of
    # ~200 rows each, >25 stages of pure per-task overhead. Partition count
    # is derived from the DATA (edges per partition, ~32 MB of long pairs),
    # clamped to the session setting so a genuinely large edge set keeps
    # full parallelism — this is data-sized partitioning, not a local-mode
    # constant (a 10^10-edge frontier still uses every configured
    # partition; ERCS_CC_EDGES_PER_PART overrides the density).
    spark = edges.sparkSession
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_part = int(os.environ.get("ERCS_CC_EDGES_PER_PART", "2000000"))
    n_edges = cur.count()
    round_parts = max(1, min(base_parts, (n_edges + per_part - 1) // per_part))
    prev_sig = None
    prev_conf = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        if round_parts < base_parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(round_parts))
        for i in range(max_iterations):
            t0 = time.time()
            cur = _small_star(_sym(_large_star(_sym(cur))))
            if checkpoint:
                cur = cur.checkpoint(eager=True)  # truncate lineage per round
            else:
                cur = cur.localCheckpoint(eager=True)
            if _TRACE:
                print(
                    f"[cc] round {i} materialize {time.time() - t0:.2f}s",
                    file=sys.stderr,
                )
            if (i + 1) % probe_every and i + 1 < max_iterations:
                continue
            t0 = time.time()
            sig_row = cur.agg(
                F.count("*").alias("n"),
                F.coalesce(F.bit_xor(F.xxhash64("id1", "id2")), F.lit(0)).alias("h"),
            ).collect()[0]
            sig = (sig_row["n"], sig_row["h"])
            if _TRACE:
                print(
                    f"[cc] round {i} probe {time.time() - t0:.2f}s sig={sig}",
                    file=sys.stderr,
                )
            if sig == prev_sig:
                break
            prev_sig = sig
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_conf)
    # converged: every edge is (node, root)
    return cur.select(F.col("id1").alias("conv_id"), F.col("id2").alias("cluster_id"))


def assign_clusters(all_ids: DataFrame, components: DataFrame) -> DataFrame:
    """Final cluster table over every doc: component root, else own id.

    Equivalent to the reference's ``{node -> representative}`` output
    (resolver.py:339-345) with min-id representatives, ordered by conv_id.
    """
    return (
        all_ids.select("conv_id")
        .join(components, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce("cluster_id", F.col("conv_id")).alias("cluster_id"),
        )
        .orderBy("conv_id")
    )
