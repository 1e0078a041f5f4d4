"""End-to-end parity gate: pipeline clusters vs reference-semantics clusters.

The north rule's hard target: pairwise F1 >= 0.99 vs reference clusters on
labeled pairs at the same blocking key. "Reference clusters" are produced by
tests/reference_emulator.py — an independent single-threaded transliteration
of the reference algorithm (α=0 path) fed the SAME candidate pairs (same
blocking keys) as the Spark pipeline.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

import reference_emulator as REF
from entityresolution_capstone_spark import datagen
from entityresolution_capstone_spark import evaluate as E
from entityresolution_capstone_spark.operators import blocking as B
from entityresolution_capstone_spark.operators import scoring as SC
from entityresolution_capstone_spark.plans.pipeline import Pipeline, PipelineConfig

WEIGHTS = {"jw": 0.3, "lev": 0.2, "tfidf": 0.5}
# sits in the measured score gap: same-entity pairs >= ~0.46, cross-entity
# pairs <= ~0.29 on the seeded corpus (see datagen perturbation rates)
THRESHOLD = 0.38


@pytest.fixture(scope="module")
def corpus(spark):
    spec = datagen.CorpusSpec(n_entities=40, convs_per_entity=4, seed=23)
    return datagen.corpus_dataframes(spark, spec)


@pytest.fixture(scope="module")
def pipeline_result(spark, corpus):
    transcripts, labels = corpus
    base = tempfile.mkdtemp(prefix="ercs_e2e_")
    cfg = PipelineConfig(
        base_dir=base,
        similarity_threshold=THRESHOLD,
        scoring=SC.ScoringConfig(weights=dict(WEIGHTS)),
    )
    p = Pipeline(spark, cfg)
    result = p.run(transcripts, labels=labels)
    yield spark, p, result, transcripts, labels
    shutil.rmtree(base, ignore_errors=True)


def test_pipeline_runs_and_scores_well_vs_truth(pipeline_result):
    spark, p, result, transcripts, labels = pipeline_result
    # sanity vs ground truth (not the parity gate; datagen noise bounds this)
    assert result["f1"] >= 0.9, result


def test_parity_f1_vs_reference_emulator(pipeline_result):
    spark, p, result, transcripts, labels = pipeline_result
    docs_df = spark.read.parquet(p._path("docs"))
    pairs_df = spark.read.parquet(p._path("pairs"))
    clusters_df = spark.read.parquet(p._path("clusters"))

    docs = {r["conv_id"]: r["doc"] for r in docs_df.select("conv_id", "doc").collect()}
    cand = [(r["id1"], r["id2"]) for r in pairs_df.collect()]
    ref_clusters = REF.resolve(docs, cand, WEIGHTS, THRESHOLD)

    ref_df = spark.createDataFrame(
        [(k, v) for k, v in ref_clusters.items()], ["conv_id", "entity_id_str"]
    ).select(
        "conv_id", F.xxhash64("entity_id_str").alias("entity_id")
    )
    s = E.pairwise_precision_recall(ref_df, clusters_df)
    assert s.f1 >= 0.99, f"parity F1 {s.f1} (P={s.precision}, R={s.recall})"


def test_parity_on_labeled_pairs_same_blocking_key(pipeline_result):
    """Pair-level variant: predicted pair-matches vs reference pair-matches
    restricted to the candidate-pair universe (same blocking keys)."""
    spark, p, result, transcripts, labels = pipeline_result
    docs_df = spark.read.parquet(p._path("docs"))
    pairs_df = spark.read.parquet(p._path("pairs"))
    clusters_df = spark.read.parquet(p._path("clusters"))

    docs = {r["conv_id"]: r["doc"] for r in docs_df.select("conv_id", "doc").collect()}
    cand = [(r["id1"], r["id2"]) for r in pairs_df.collect()]
    ref_clusters = REF.resolve(docs, cand, WEIGHTS, THRESHOLD)

    mine = {r["conv_id"]: r["cluster_id"] for r in clusters_df.collect()}
    tp = fp = fn = 0
    for a, b in cand:
        ref_match = ref_clusters[a] == ref_clusters[b]
        my_match = mine[a] == mine[b]
        tp += ref_match and my_match
        fp += my_match and not ref_match
        fn += ref_match and not my_match
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    assert f1 >= 0.99, (tp, fp, fn)


def test_determinism_two_runs_identical(spark, corpus):
    transcripts, labels = corpus
    outs = []
    for i in range(2):
        base = tempfile.mkdtemp(prefix=f"ercs_det{i}_")
        cfg = PipelineConfig(
            base_dir=base,
            similarity_threshold=THRESHOLD,
            scoring=SC.ScoringConfig(weights=dict(WEIGHTS)),
        )
        Pipeline(spark, cfg).run(transcripts)
        outs.append(
            sorted(
                (r["conv_id"], r["cluster_id"])
                for r in spark.read.parquet(f"{base}/clusters").collect()
            )
        )
        shutil.rmtree(base, ignore_errors=True)
    assert outs[0] == outs[1]


def test_pipeline_average_linkage_path(spark, corpus):
    """PipelineConfig(linkage='average') routes clustering through the
    agglomerative merge loop and still recovers the entities well (the seeded
    corpus's within-entity sims are far above cross-entity sims, so avg
    linkage finds the same clusters as max at this threshold)."""
    import tempfile, shutil

    from entityresolution_capstone_spark import evaluate as EV

    transcripts, labels = corpus
    base = tempfile.mkdtemp(prefix="ercs_avglink_")
    cfg = PipelineConfig(
        base_dir=base,
        similarity_threshold=THRESHOLD,
        scoring=SC.ScoringConfig(weights=dict(WEIGHTS)),
        linkage="average",
    )
    result = Pipeline(spark, cfg).run(transcripts, labels=labels)
    clusters = spark.read.parquet(result["clusters_path"])
    s = EV.pairwise_precision_recall(labels, clusters)
    assert s.f1 >= 0.95
    shutil.rmtree(base, ignore_errors=True)


def test_pipeline_iterative_alpha_path(spark, corpus):
    """PipelineConfig(alpha>0) + an edges table routes clustering through the
    round-synchronous relational re-scoring loop (C5)."""
    import tempfile, shutil

    from pyspark.sql import functions as F

    from entityresolution_capstone_spark import evaluate as EV

    transcripts, labels = corpus
    # synthetic hyper-edges: co-membership by conv hash (any deterministic
    # grouping works; rel_sim just needs a real neighbor structure)
    edges = transcripts.select("conv_id").distinct().select(
        "conv_id", F.pmod(F.xxhash64("conv_id"), F.lit(11)).alias("edge_id")
    )
    base = tempfile.mkdtemp(prefix="ercs_alpha_")
    cfg = PipelineConfig(
        base_dir=base,
        similarity_threshold=THRESHOLD,
        scoring=SC.ScoringConfig(weights=dict(WEIGHTS), alpha=0.2),
        rel_strategy="adar_neighbor",
    )
    result = Pipeline(spark, cfg).run(transcripts, labels=labels, edges=edges)
    clusters = spark.read.parquet(result["clusters_path"])
    assert clusters.count() == transcripts.select("conv_id").distinct().count()
    # alpha=0.2 with random edges dilutes scores; threshold scaled by (1-a)
    # would recover max-linkage clusters — here we only assert the loop runs,
    # converges, and emits a full assignment with stable schema
    assert set(clusters.columns) >= {"conv_id", "cluster_id"}
    shutil.rmtree(base, ignore_errors=True)
