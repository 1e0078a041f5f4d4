"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exact baseline; broadcast the (small) query
  set, JVM-side dot products (zip_with + aggregate), window top-k.
- LSH-bucketed ANN: deterministic random-hyperplane signatures with *integer*
  plane vectors (derived from index arithmetic, no RNG) so the bucketing is
  exactly reproducible in ANSI SQL for the correctness oracle. Candidates are
  restricted to query-bucket collisions; recall vs brute force is measured in
  tests, not assumed.

At cluster scale: corpus embeddings stay partitioned; only queries broadcast.
A 100-TB corpus with 1e9 vectors × 8 bucket bits shards into ~256 buckets per
plane-set; bucket skew is handled the same way as blocking skew (cap + report).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_norm(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )


def _cosine(v1, v2, n1, n2):
    dot = F.aggregate(F.zip_with(v1, v2, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    return F.when((n1 > 0) & (n2 > 0), dot / (n1 * n2)).otherwise(F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank<=k), exact. Queries are broadcast."""
    c = _with_norm(corpus, id_col, vec_col)
    q = _with_norm(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("norm")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _plane_coeff(p: int, d: int) -> int:
    """Deterministic integer plane coefficient in [-8, 8]: pure index algebra,
    reproducible in any SQL dialect."""
    return ((p * 131 + d * 137 + 41) % 17) - 8


def lsh_bucket_keys(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 1,
) -> DataFrame:
    """(id, bucket) — sign bits of integer-plane dot products, concatenated.

    ``n_tables`` > 1 emits one bucket key per independent plane set
    (OR-amplification: candidates collide in ANY table, the standard
    recall/candidate-count dial). dim is taken from the data (first row);
    planes are fixed functions of (table, plane, dim) index so SQL oracles
    regenerate them identically.
    """
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    v = embeddings.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    keys = []
    for t in range(n_tables):
        bits = [F.lit(f"{t}:")]
        for p in range(n_planes):
            coeffs = F.array(
                *[F.lit(float(_plane_coeff(t * n_planes + p, d))) for d in range(dim)]
            )
            dot = F.aggregate(
                F.zip_with(F.col("v"), coeffs, lambda x, c: x * c),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            bits.append(F.when(dot > 0, F.lit("1")).otherwise(F.lit("0")))
        keys.append(F.concat(*bits))
    return v.select("id", F.explode(F.array(*keys)).alias("bucket"))


def bucket_size_metrics(buckets: DataFrame, max_bucket_size: int) -> DataFrame:
    """(bucket, size, dropped): the blocking-style cap+report accounting for
    ANN buckets — a degenerate embedding cluster (e.g. all-zero vectors) lands
    in ONE bucket and would turn the bucket join into an O(s*q) straggler."""
    return buckets.groupBy("bucket").agg(F.count("*").alias("size")).select(
        "bucket",
        F.col("size").cast("long").alias("size"),
        (F.col("size") > max_bucket_size).alias("dropped"),
    )


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Approximate top-k: candidates share any LSH table bucket with the query.

    ``max_bucket_size``: corpus buckets larger than this are EXCLUDED from the
    candidate join (skew cap, same policy as blocking.candidate_pairs; use
    :func:`bucket_size_metrics` on :func:`lsh_bucket_keys` output to report
    what was dropped). With multi-table OR-amplification a vector dropped from
    one hot bucket usually still reaches its queries through another table.
    """
    cb = lsh_bucket_keys(corpus, id_col, vec_col, n_planes, n_tables)
    if max_bucket_size is not None:
        hot = (
            cb.groupBy("bucket")
            .agg(F.count("*").alias("_sz"))
            .filter(F.col("_sz") > max_bucket_size)
            .select("bucket")
        )
        cb = cb.join(F.broadcast(hot), "bucket", "left_anti")
    qb = lsh_bucket_keys(queries, id_col, vec_col, n_planes, n_tables).select(
        F.col("id").alias("query_id"), "bucket"
    )
    c = _with_norm(corpus, id_col, vec_col)
    q = _with_norm(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    cand = (
        cb.withColumnRenamed("id", "neighbor_id")
        .join(qb, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()  # collapse multi-table collisions before scoring
    )
    scored = (
        cand.join(c.select(F.col("id").alias("neighbor_id"), "v", "norm"), "neighbor_id")
        .join(q.select("query_id", "qv", "qn"), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _cosine(F.col("qv"), F.col("v"), F.col("qn"), F.col("norm")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
