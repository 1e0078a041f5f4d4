"""TF-IDF machinery: corpus document frequencies, JVM-side TF-IDF cosine,
and the soft-TF-IDF pandas-UDF kernel.

The reference fits ``py_stringmatching.SoftTfIdf`` on the whole per-attribute
corpus (/root/reference/src/entity_resolver/core/utils.py:347-396, corpus built
at core/graph.py:251-261). Its exact algebra — re-derived from the published
algorithm and pinned by the reference's own golden scores
(/root/reference/tests/test_core.py:161-166):

- ``idf(t) = corpus_size / df(t)``  (plain ratio, no log)
- similarity map: for each distinct token x of bag1, the best-matching distinct
  token y of bag2 under the secondary similarity, kept iff ``sim > threshold``
- numerator  = sum over map entries of ``idf(x)*tf1(x) * idf(y)*tf2(y) * sim``
- normalized by ``||v1|| * ||v2||`` where ``v_i`` are the plain tf-idf vectors
- the reference symmetrizes with ``max(score(a,b), score(b,a))``
  (utils.py:389-395).

At scale the *primary* scoring kernel is the plain TF-IDF cosine below — pure
DataFrame algebra (explode + broadcast DF join + groupBy), fully JVM-side, no
Python. Soft-TF-IDF is the parity kernel for reference-equivalent scoring and
runs as a vectorized pandas UDF with a broadcast document-frequency dict.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .similarity import jaro_batch, jaro_winkler_batch, scaled_levenshtein_batch


def doc_frequencies(docs: DataFrame, tokens_col: str = "tokens", id_col: str = "conv_id") -> DataFrame:
    """Document-frequency table: (token, df). One shuffle (groupBy token)."""
    return (
        docs.select(id_col, F.explode(F.array_distinct(F.col(tokens_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("df"))
    )


def tfidf_vectors(
    docs: DataFrame,
    df_table: DataFrame,
    corpus_size: int,
    tokens_col: str = "tokens",
    id_col: str = "conv_id",
) -> DataFrame:
    """Per-(doc, token) tf-idf weights: (id, token, w) with ``w = tf * N/df``.

    ``df_table`` is broadcast when small; at 100 TB scale the join keys are
    co-partitioned by token hash so this is a plain shuffle-hash join.
    """
    tf = (
        docs.select(id_col, F.explode(tokens_col).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count("*").alias("tf"))
    )
    return tf.join(F.broadcast(df_table), "token").select(
        id_col,
        "token",
        (F.col("tf") * F.lit(float(corpus_size)) / F.col("df")).alias("w"),
    )


def tfidf_norms(vectors: DataFrame, id_col: str = "conv_id") -> DataFrame:
    """Per-doc L2 norm of the tf-idf vector: (id, norm)."""
    return vectors.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))


def tfidf_cosine_pairs(
    pairs: DataFrame,
    vectors: DataFrame,
    norms: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Cosine similarity for candidate pairs, entirely JVM-side.

    Plan shape: pairs ⋈ v1 (on id1) ⋈ v2 (on id2, token) → partial-aggregated
    dot products → ⋈ norms. Pairs with no shared token get cosine 0.
    """
    v1 = vectors.select(F.col("conv_id").alias(id1), "token", F.col("w").alias("w1"))
    v2 = vectors.select(F.col("conv_id").alias(id2), "token", F.col("w").alias("w2"))
    dots = (
        pairs.join(v1, id1)
        .join(v2, [id2, "token"])
        .groupBy(id1, id2)
        .agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    n1 = F.broadcast(norms.select(F.col("conv_id").alias(id1), F.col("norm").alias("norm1")))
    n2 = F.broadcast(norms.select(F.col("conv_id").alias(id2), F.col("norm").alias("norm2")))
    return (
        pairs.join(dots, [id1, id2], "left")
        .join(n1, id1)
        .join(n2, id2)
        .select(
            id1,
            id2,
            F.when(
                (F.col("norm1") > 0) & (F.col("norm2") > 0),
                F.coalesce(F.col("dot"), F.lit(0.0)) / (F.col("norm1") * F.col("norm2")),
            )
            .otherwise(F.lit(0.0))
            .alias("tfidf_cosine"),
        )
    )


# ---------------------------------------------------------------------------
# Soft-TF-IDF (reference-parity kernel, vectorized pandas UDF)
# ---------------------------------------------------------------------------

_SECONDARY = {
    "jaro_winkler": jaro_winkler_batch,
    "jaro": jaro_batch,
    "scaled_lev": scaled_levenshtein_batch,
}


def soft_tfidf_raw(
    bag1: list[str],
    bag2: list[str],
    df_map: dict[str, int],
    corpus_size: int,
    threshold: float = 0.5,
    second_sim: str = "jaro_winkler",
) -> float:
    """Single-direction soft-TF-IDF raw score (driver/test helper).

    The batched path below shares the same algebra; this scalar version exists
    so tests can pin both against the reference's golden fixtures.
    """
    if not bag1 or not bag2:
        return 0.0
    kernel = _SECONDARY[second_sim]
    tf1: dict[str, int] = {}
    tf2: dict[str, int] = {}
    for t in bag1:
        tf1[t] = tf1.get(t, 0) + 1
    for t in bag2:
        tf2[t] = tf2.get(t, 0) + 1
    u1, u2 = list(tf1), list(tf2)
    xs = np.array([x for x in u1 for _ in u2], dtype=object)
    ys = np.array(u2 * len(u1), dtype=object)
    sims = kernel(xs, ys).reshape(len(u1), len(u2))
    num = 0.0
    for i, x in enumerate(u1):
        j = int(np.argmax(sims[i]))
        s = float(sims[i, j])
        if s > threshold and x in df_map:
            y = u2[j]
            num += (
                (corpus_size / df_map[x]) * tf1[x]
                * (corpus_size / df_map.get(y, 1)) * tf2[y]
                * s
            )
    vx2 = sum(((corpus_size / df_map[t]) * c) ** 2 for t, c in tf1.items() if t in df_map)
    vy2 = sum(((corpus_size / df_map[t]) * c) ** 2 for t, c in tf2.items() if t in df_map)
    if vx2 == 0 or vy2 == 0:
        return 0.0
    return num / (np.sqrt(vx2) * np.sqrt(vy2))


def make_soft_tfidf_udf(
    spark_df_map,
    corpus_size: int,
    threshold: float = 0.5,
    second_sim: str = "jaro_winkler",
    symmetric: bool = True,
):
    """Pandas UDF (tokens1 array, tokens2 array) -> double soft-TF-IDF score.

    ``spark_df_map`` is a broadcast variable holding {token: df}. The secondary
    similarity over the token cross-product is evaluated through the batched
    NumPy kernels (one flattened kernel call per Arrow batch — token pairs from
    every row in the batch are scored in a single vectorized call).
    """
    kernel = _SECONDARY[second_sim]

    @pandas_udf("double")
    def stfidf_udf(t1: pd.Series, t2: pd.Series) -> pd.Series:
        df_map = spark_df_map.value
        n = len(t1)
        # Flatten all distinct-token cross products across the batch.
        metas = []  # (row, u1, u2, tf1, tf2, offset, len)
        xs: list[str] = []
        ys: list[str] = []
        for r in range(n):
            b1 = t1.iloc[r]
            b2 = t2.iloc[r]
            if b1 is None or b2 is None or len(b1) == 0 or len(b2) == 0:
                metas.append(None)
                continue
            tf1: dict[str, int] = {}
            tf2: dict[str, int] = {}
            for t in b1:
                tf1[t] = tf1.get(t, 0) + 1
            for t in b2:
                tf2[t] = tf2.get(t, 0) + 1
            u1, u2 = list(tf1), list(tf2)
            off = len(xs)
            for x in u1:
                for y in u2:
                    xs.append(x)
                    ys.append(y)
            metas.append((u1, u2, tf1, tf2, off))
        sims = (
            kernel(np.array(xs, dtype=object), np.array(ys, dtype=object))
            if xs
            else np.empty(0)
        )

        def directed(u1, u2, tf1, tf2, sim_block) -> float:
            num = 0.0
            for i, x in enumerate(u1):
                row = sim_block[i]
                j = int(np.argmax(row))
                s = float(row[j])
                if s > threshold and x in df_map:
                    y = u2[j]
                    num += (
                        (corpus_size / df_map[x]) * tf1[x]
                        * (corpus_size / df_map.get(y, 1)) * tf2[y]
                        * s
                    )
            vx2 = sum(((corpus_size / df_map[t]) * c) ** 2 for t, c in tf1.items() if t in df_map)
            vy2 = sum(((corpus_size / df_map[t]) * c) ** 2 for t, c in tf2.items() if t in df_map)
            if vx2 == 0 or vy2 == 0:
                return 0.0
            return num / float(np.sqrt(vx2) * np.sqrt(vy2))

        out = np.zeros(n, dtype=np.float64)
        for r, meta in enumerate(metas):
            if meta is None:
                continue
            u1, u2, tf1, tf2, off = meta
            block = sims[off : off + len(u1) * len(u2)].reshape(len(u1), len(u2))
            s1 = directed(u1, u2, tf1, tf2, block)
            if symmetric:
                s2 = directed(u2, u1, tf2, tf1, block.T)
                out[r] = max(s1, s2)
            else:
                out[r] = s1
        return pd.Series(out)

    return stfidf_udf
