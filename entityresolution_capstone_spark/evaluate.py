"""Clustering evaluation: distributed pairwise P/R/F1 + driver-side AMI/V-measure.

Pairwise metrics use exactly the contingency algebra of the reference
(/root/reference/src/entity_resolver/core/utils.py:655-696):
``TP = Σ_ij C(n_ij, 2)``, ``FP = Σ_j C(pred_j, 2) − TP``,
``FN = Σ_i C(label_i, 2) − TP`` — all three are plain groupBy aggregations, so
the metric distributes to any scale.

AMI and V-measure (reference utils.py:698-767 via sklearn) are re-implemented
from the published formulas on the *contingency counts* (clusters ≪ rows, so
collecting the contingency table to the driver is safe at any input scale).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PairwiseScores:
    precision: float
    recall: float
    f1: float
    tp: float
    fp: float
    fn: float


def _comb2(col):
    return F.sum(col * (col - 1) / 2.0)


def pairwise_precision_recall(
    labels: DataFrame,
    preds: DataFrame,
    id_col: str = "conv_id",
    label_col: str = "entity_id",
    pred_col: str = "cluster_id",
) -> PairwiseScores:
    """Pairwise precision / recall / F1 between two clusterings.

    Rows are aligned by an inner join on ``id_col`` (the reference aligns
    positionally after sorting, evaluator.py:73-98 — join is the same pairing,
    robust to partitioning).
    """
    j = labels.select(id_col, label_col).join(preds.select(id_col, pred_col), id_col)
    cont = j.groupBy(label_col, pred_col).agg(F.count("*").alias("n"))
    tp = cont.agg(_comb2(F.col("n")).alias("v")).collect()[0]["v"] or 0.0
    pred_pairs = (
        j.groupBy(pred_col).agg(F.count("*").alias("n"))
        .agg(_comb2(F.col("n")).alias("v")).collect()[0]["v"] or 0.0
    )
    label_pairs = (
        j.groupBy(label_col).agg(F.count("*").alias("n"))
        .agg(_comb2(F.col("n")).alias("v")).collect()[0]["v"] or 0.0
    )
    fp = pred_pairs - tp
    fn = label_pairs - tp
    precision = tp / pred_pairs if pred_pairs else 0.0
    recall = tp / label_pairs if label_pairs else 0.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall) > 0
        else 0.0
    )
    return PairwiseScores(precision, recall, f1, tp, fp, fn)


def pairwise_f1_on_pairs(
    scored_pairs: DataFrame,
    labels: DataFrame,
    candidate_pairs: DataFrame,
    id1: str = "id1",
    id2: str = "id2",
) -> PairwiseScores:
    """Pair-level P/R/F1 restricted to the candidate-pair universe.

    This is the north-rule gate: "pairwise F1 vs reference clusters on labeled
    pairs (same blocking key)". ``scored_pairs`` = predicted-match pairs;
    ``candidate_pairs`` = the universe; labels define true matches.
    """
    l1 = labels.select(F.col("conv_id").alias(id1), F.col("entity_id").alias("_e1"))
    l2 = labels.select(F.col("conv_id").alias(id2), F.col("entity_id").alias("_e2"))
    univ = (
        candidate_pairs.join(l1, id1)
        .join(l2, id2)
        .select(id1, id2, (F.col("_e1") == F.col("_e2")).alias("is_match"))
    )
    pred = scored_pairs.select(id1, id2).withColumn("_pred", F.lit(True))
    u = univ.join(pred, [id1, id2], "left").select(
        "is_match", F.coalesce("_pred", F.lit(False)).alias("pred")
    )
    agg = u.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("is_match") & F.col("pred"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("is_match") & ~F.col("pred"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = float(agg["tp"]), float(agg["fp"]), float(agg["fn"])
    precision = tp / (tp + fp) if (tp + fp) else 1.0
    recall = tp / (tp + fn) if (tp + fn) else 1.0
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) else 0.0
    return PairwiseScores(precision, recall, f1, tp, fp, fn)


# ---------------------------------------------------------------------------
# Driver-side information-theoretic metrics from the contingency table
# ---------------------------------------------------------------------------

def _contingency(labels: DataFrame, preds: DataFrame, id_col, label_col, pred_col):
    j = labels.select(id_col, label_col).join(preds.select(id_col, pred_col), id_col)
    rows = j.groupBy(label_col, pred_col).agg(F.count("*").alias("n")).collect()
    la = sorted({r[label_col] for r in rows})
    pr = sorted({r[pred_col] for r in rows})
    li = {v: i for i, v in enumerate(la)}
    pi = {v: i for i, v in enumerate(pr)}
    m = np.zeros((len(la), len(pr)), dtype=np.int64)
    for r in rows:
        m[li[r[label_col]], pi[r[pred_col]]] = r["n"]
    return m


def _entropy(counts: np.ndarray) -> float:
    n = counts.sum()
    p = counts[counts > 0] / n
    return float(-(p * np.log(p)).sum())


def _mutual_info(m: np.ndarray) -> float:
    n = m.sum()
    a = m.sum(axis=1)
    b = m.sum(axis=0)
    mi = 0.0
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            nij = m[i, j]
            if nij == 0:
                continue
            mi += (nij / n) * math.log(n * nij / (a[i] * b[j]))
    return mi


def _expected_mutual_info(m: np.ndarray) -> float:
    """EMI under the hypergeometric model (Vinh, Epps & Bailey 2010)."""
    n = int(m.sum())
    a = m.sum(axis=1).astype(int)
    b = m.sum(axis=0).astype(int)
    lg = math.lgamma
    emi = 0.0
    for ai in a:
        for bj in b:
            lo = max(1, ai + bj - n)
            hi = min(ai, bj)
            for nij in range(lo, hi + 1):
                t1 = (nij / n) * math.log(n * nij / (ai * bj))
                t2 = math.exp(
                    lg(ai + 1) + lg(bj + 1) + lg(n - ai + 1) + lg(n - bj + 1)
                    - lg(n + 1) - lg(nij + 1) - lg(ai - nij + 1)
                    - lg(bj - nij + 1) - lg(n - ai - bj + nij + 1)
                )
                emi += t1 * t2
    return emi


def ami_score(
    labels: DataFrame,
    preds: DataFrame,
    id_col: str = "conv_id",
    label_col: str = "entity_id",
    pred_col: str = "cluster_id",
    average_method: str = "max",
) -> float:
    """Adjusted Mutual Information (reference default average_method='max')."""
    m = _contingency(labels, preds, id_col, label_col, pred_col)
    mi = _mutual_info(m)
    emi = _expected_mutual_info(m)
    h1 = _entropy(m.sum(axis=1))
    h2 = _entropy(m.sum(axis=0))
    if average_method == "max":
        norm = max(h1, h2)
    elif average_method == "min":
        norm = min(h1, h2)
    elif average_method == "geometric":
        norm = math.sqrt(h1 * h2)
    else:
        norm = (h1 + h2) / 2.0
    denom = norm - emi
    if denom == 0:
        return 1.0
    return (mi - emi) / denom


def v_measure_score(
    labels: DataFrame,
    preds: DataFrame,
    id_col: str = "conv_id",
    label_col: str = "entity_id",
    pred_col: str = "cluster_id",
    beta: float = 1.0,
) -> float:
    """V-measure (Rosenberg & Hirschberg 2007): harmonic mean of homogeneity
    and completeness computed from conditional entropies."""
    m = _contingency(labels, preds, id_col, label_col, pred_col)
    h_label = _entropy(m.sum(axis=1))
    h_pred = _entropy(m.sum(axis=0))
    mi = _mutual_info(m)
    h_label_given_pred = h_label - mi
    h_pred_given_label = h_pred - mi
    homogeneity = 1.0 if h_label == 0 else max(0.0, 1.0 - h_label_given_pred / h_label)
    completeness = 1.0 if h_pred == 0 else max(0.0, 1.0 - h_pred_given_label / h_pred)
    if homogeneity + completeness == 0:
        return 0.0
    return (
        (1 + beta) * homogeneity * completeness
        / (beta * homogeneity + completeness)
    )


def precision_recall_sweep(
    scored_pairs: DataFrame,
    labels: DataFrame,
    thresholds: list[float],
    id1: str = "id1",
    id2: str = "id2",
    sim_col: str = "sim",
) -> DataFrame:
    """Pair-level precision/recall at K thresholds from ONE scored-pairs pass.

    The reference samples a precision-recall curve by re-evaluating mid-
    clustering every ``len(pqueue)//1600`` merges (resolver.py:523-526,
    695-712) — inherently sequential. The distributed equivalent: for each
    threshold θ, a predicted match is a pair with sim >= θ, so P/R at every θ
    come from K conditional aggregations over one table scan.

    Returns (threshold, tp, fp, fn, precision, recall) with recall relative to
    labeled matches within the candidate-pair universe.
    """
    l1 = labels.select(
        F.col("conv_id").alias(id1), F.col("entity_id").alias("_e1")
    )
    l2 = labels.select(
        F.col("conv_id").alias(id2), F.col("entity_id").alias("_e2")
    )
    j = scored_pairs.join(l1, id1).join(l2, id2).select(
        (F.col("_e1") == F.col("_e2")).alias("m"), F.col(sim_col).alias("s")
    )
    aggs = []
    for i, t in enumerate(thresholds):
        pred = F.col("s") >= F.lit(float(t))
        aggs += [
            F.sum(F.when(pred & F.col("m"), 1).otherwise(0)).alias(f"tp{i}"),
            F.sum(F.when(pred & ~F.col("m"), 1).otherwise(0)).alias(f"fp{i}"),
            F.sum(F.when(~pred & F.col("m"), 1).otherwise(0)).alias(f"fn{i}"),
        ]
    row = j.agg(*aggs).collect()[0]
    out = []
    for i, t in enumerate(thresholds):
        tp, fp, fn = row[f"tp{i}"] or 0, row[f"fp{i}"] or 0, row[f"fn{i}"] or 0
        p = tp / (tp + fp) if tp + fp else 1.0
        r = tp / (tp + fn) if tp + fn else 1.0
        out.append((float(t), int(tp), int(fp), int(fn), p, r))
    spark = scored_pairs.sparkSession
    return spark.createDataFrame(
        out, "threshold double, tp long, fp long, fn long, precision double, recall double"
    )


def evaluate(
    labels: DataFrame,
    preds: DataFrame,
    strategy="precision_recall",
    **kwargs,
):
    """Dispatching evaluator mirroring the reference Evaluator.evaluate
    (evaluator.py:73-98): named strategy or a user callable
    ``(labels_list, preds_list, **kwargs) -> score`` (E4, main.py:500-510).

    Rows are aligned by an inner join on conv_id (the distributed-safe
    equivalent of the reference's sort + positional zip)."""
    if callable(strategy):
        j = (
            labels.select("conv_id", "entity_id")
            .join(preds.select("conv_id", "cluster_id"), "conv_id")
            .orderBy("conv_id")
            .collect()
        )
        return strategy([r["entity_id"] for r in j], [r["cluster_id"] for r in j], **kwargs)
    if strategy == "precision_recall":
        s = pairwise_precision_recall(labels, preds)
        return (s.precision, s.recall, s.f1)
    if strategy == "ami":
        return ami_score(labels, preds, **kwargs)
    if strategy == "v_measure":
        return v_measure_score(labels, preds, **kwargs)
    if strategy == "bcubed":
        row = bcubed(labels, preds, **kwargs).collect()[0]
        return (row["bcubed_precision"], row["bcubed_recall"], row["bcubed_f1"])
    raise ValueError(f"unknown evaluator strategy: {strategy}")


def plot_prc(sweep_df: DataFrame, out_path: str) -> str | None:
    """Precision-recall-curve sink (reference EntityResolver._plot,
    main.py:752-765). Collects the (tiny) sweep table and renders via
    matplotlib when available; returns the written path or None when the
    plotting stack is absent (this sandbox)."""
    rows = sorted(sweep_df.collect(), key=lambda r: r["threshold"])
    try:
        import matplotlib  # noqa: PLC0415

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt  # noqa: PLC0415
    except ImportError:
        return None
    fig, ax = plt.subplots()
    ax.plot([r["recall"] for r in rows], [r["precision"] for r in rows], marker="o")
    ax.set_xlabel("recall")
    ax.set_ylabel("precision")
    ax.set_title("precision-recall sweep")
    fig.savefig(out_path)
    return out_path


def blocking_quality(
    candidates: DataFrame,
    labels: DataFrame,
    id_col: str = "conv_id",
    label_col: str = "entity_id",
) -> DataFrame:
    """Blocking-scheme quality: reduction ratio / pair completeness / pair
    quality vs ground-truth entities (the standard blocking triad, e.g.
    Christen's ER survey; complements the per-block size accounting in
    operators/blocking.block_size_metrics).

    ``candidates``: (id1, id2) unordered candidate pairs (id1 < id2);
    ``labels``: one row per record with ``id_col`` + ``label_col``.

    All three metrics reduce to four scalar aggregates — record count,
    candidate count, true-pair count (sum of C(m,2) over entity sizes), and
    covered true pairs (candidates whose two sides share an entity, counted
    via two broadcast-sized joins on the label table) — no pair
    materialization beyond the candidate set itself. Returns one row, doubles
    rounded to 6dp:

    - reduction_ratio  = 1 - |cand| / C(n,2)
    - pair_completeness = |cand ∩ true| / |true|   (blocking recall)
    - pair_quality      = |cand ∩ true| / |cand|   (blocking precision)
    """
    lab1 = labels.select(
        F.col(id_col).alias("id1"), F.col(label_col).alias("_e1")
    )
    lab2 = labels.select(
        F.col(id_col).alias("id2"), F.col(label_col).alias("_e2")
    )
    n = labels.count()
    n_cand = candidates.count()
    covered = (
        candidates.join(lab1, "id1")
        .join(lab2, "id2")
        .filter(F.col("_e1") == F.col("_e2"))
        .count()
    )
    true_pairs = (
        labels.groupBy(label_col)
        .agg(F.count(F.lit(1)).alias("_m"))
        .select(F.sum(F.col("_m") * (F.col("_m") - 1) / 2).alias("v"))
        .collect()[0]["v"]
        or 0.0
    )
    total_pairs = n * (n - 1) / 2.0
    spark = candidates.sparkSession
    return spark.createDataFrame(
        [
            (
                int(n),
                int(n_cand),
                int(true_pairs),
                int(covered),
                round(1.0 - n_cand / total_pairs if total_pairs else 0.0, 6),
                round(covered / true_pairs if true_pairs else 0.0, 6),
                round(covered / n_cand if n_cand else 0.0, 6),
            )
        ],
        "n_records long, n_candidates long, n_true_pairs long, n_covered long, "
        "reduction_ratio double, pair_completeness double, pair_quality double",
    )


def cluster_drift(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "conv_id",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Churn between two clusterings of the SAME records (run A vs run B) —
    the monitoring metric for incremental resolution (operators/incremental):
    how much did today's catalog reshuffle yesterday's entities?

    Everything reduces to the (a_cluster, b_cluster) contingency table
    (clusters ≪ records, one groupBy) — no pair materialization:

    - ``n_stable``: A-clusters whose member set is EXACTLY one whole
      B-cluster (all members in one B-cluster, and that B-cluster has no
      other members);
    - ``n_split``: A-clusters whose members land in >1 B-cluster;
    - ``n_merged``: B-clusters containing members from >1 A-cluster;
    - ``pair_jaccard``: |pairs(A) ∩ pairs(B)| / |pairs(A) ∪ pairs(B)| via
      the C(n,2) sums over sizes and contingency cells (1.0 iff identical
      clusterings, counting only co-clustered pairs).

    Records present in only one input are ignored (inner join on the id).
    Returns one row: (n_records, n_clusters_a, n_clusters_b, n_stable,
    n_split, n_merged, pair_jaccard).
    """
    aa = a.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_ca"))
    bb = b.select(F.col(id_col).alias("_id"), F.col(cluster_col).alias("_cb"))
    j = aa.join(bb, "_id")
    cont = j.groupBy("_ca", "_cb").agg(F.count("*").alias("_n")).persist()
    sizes_a = cont.groupBy("_ca").agg(
        F.sum("_n").alias("_m"), F.count("*").alias("_parts")
    )
    sizes_b = cont.groupBy("_cb").agg(
        F.sum("_n").alias("_m"), F.count("*").alias("_parts")
    )
    pairs_a = sizes_a.select(_comb2(F.col("_m")).alias("v")).collect()[0]["v"] or 0.0
    pairs_b = sizes_b.select(_comb2(F.col("_m")).alias("v")).collect()[0]["v"] or 0.0
    pairs_both = cont.select(_comb2(F.col("_n")).alias("v")).collect()[0]["v"] or 0.0
    n_records = int(
        cont.select(F.sum("_n").alias("v")).collect()[0]["v"] or 0
    )
    n_a = sizes_a.count()
    n_b = sizes_b.count()
    n_split = sizes_a.filter(F.col("_parts") > 1).count()
    n_merged = sizes_b.filter(F.col("_parts") > 1).count()
    # stable: A-cluster in exactly one B-cluster AND that B-cluster's total
    # size equals the shared cell (no extra members from other A-clusters)
    whole_a = (
        sizes_a.filter(F.col("_parts") == 1)
        .select("_ca", F.col("_m").alias("_ma"))
        .join(cont, "_ca")
        .join(sizes_b.select("_cb", F.col("_m").alias("_mb")), "_cb")
    )
    n_stable = whole_a.filter(F.col("_ma") == F.col("_mb")).count()
    cont.unpersist()
    union_pairs = pairs_a + pairs_b - pairs_both
    spark = a.sparkSession
    return spark.createDataFrame(
        [
            (
                n_records,
                int(n_a),
                int(n_b),
                int(n_stable),
                int(n_split),
                int(n_merged),
                round(pairs_both / union_pairs if union_pairs else 1.0, 6),
            )
        ],
        "n_records long, n_clusters_a long, n_clusters_b long, n_stable long, "
        "n_split long, n_merged long, pair_jaccard double",
    )


def bcubed(
    labels: DataFrame,
    preds: DataFrame,
    id_col: str = "conv_id",
    label_col: str = "entity_id",
    pred_col: str = "cluster_id",
) -> DataFrame:
    """B-cubed precision / recall / F1 (Bagga & Baldwin 1998) — the standard
    per-record clustering metric alongside pairwise F1 / AMI / V-measure
    (reference evaluates clusterings via utils.py:655-767; B³ is the
    per-record counterpart of its pairwise contingency algebra).

    Per record e: precision(e) = |C(e) ∩ L(e)| / |C(e)|,
    recall(e) = |C(e) ∩ L(e)| / |L(e)|; B³ P/R are the means over records.
    Every record in a (label, pred) contingency cell of size n shares the
    same terms, so the whole metric is three groupBy aggregations over the
    cell table — fully distributed, no pair materialization, no collect of
    anything wider than one row.

    Exactness discipline: per-record terms are floored to integer
    micro-units (``(n * 1_000_000) div cluster_size`` — pure int64 algebra)
    before summing, so the result is independent of partitioning /
    summation order and bit-reproducible in the ANSI-SQL oracle. Bounds:
    each record contributes ≤ 1e6 micro-units, so the sums stay inside
    int64 up to ~9e12 records.

    Returns one row: (n_records, bcubed_precision, bcubed_recall,
    bcubed_f1), doubles rounded to 6dp.
    """
    j = labels.select(id_col, label_col).join(preds.select(id_col, pred_col), id_col)
    cont = j.groupBy(label_col, pred_col).agg(F.count("*").cast("long").alias("n"))
    pc = j.groupBy(pred_col).agg(F.count("*").cast("long").alias("pc"))
    lc = j.groupBy(label_col).agg(F.count("*").cast("long").alias("lc"))
    cells = cont.join(pc, pred_col).join(lc, label_col)
    agg = cells.agg(
        F.sum("n").alias("n_tot"),
        F.sum(F.expr("n * ((n * 1000000) div pc)")).alias("mp"),
        F.sum(F.expr("n * ((n * 1000000) div lc)")).alias("mr"),
    ).select(
        F.col("n_tot").cast("long").alias("n_records"),
        (F.col("mp").cast("double") / (F.col("n_tot") * F.lit(1000000.0))).alias("_p"),
        (F.col("mr").cast("double") / (F.col("n_tot") * F.lit(1000000.0))).alias("_r"),
    )
    return agg.select(
        "n_records",
        F.round("_p", 6).alias("bcubed_precision"),
        F.round("_r", 6).alias("bcubed_recall"),
        F.round(
            F.when(
                (F.col("_p") + F.col("_r")) > 0,
                2.0 * F.col("_p") * F.col("_r") / (F.col("_p") + F.col("_r")),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("bcubed_f1"),
    )
