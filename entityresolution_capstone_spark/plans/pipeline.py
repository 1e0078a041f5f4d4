"""End-to-end resolution pipeline with per-stage commit, lineage and resume.

Stage graph (each stage: DataFrame in -> DataFrame out -> committed table):

    ingest -> canonicalize -> block -> pairs -> score -> bootstrap
           -> cluster (threshold + negative constraint + CC) -> evaluate

North-rule contract implemented here:
- every stage writes its output through the manifest-committed writer
  (sources/tables.py) — a killed run relaunches and *skips every committed
  stage* (resume-from-checkpoint);
- every stage appends per-partition lineage rows (run_id, stage, partition_id,
  rows_out, wall_ms) plus stage-level metrics to the ``_metrics`` table;
- the connected-components frontier is checkpointed per round (operators/cc.py).

The reference's equivalent control flow is ``Resolver.resolve``
(/root/reference/src/entity_resolver/core/resolver.py:295-345) — a
single-threaded in-memory sequence; here each arrow is a Catalyst-planned
distributed job with an on-disk commit point.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tfidf import doc_frequencies
from ..operators import blocking as B
from ..operators import bootstrap as BS
from ..operators import cc as CC
from ..operators import canonicalize as CAN
from ..operators import scoring as SC
from ..sources import tables as TBL


@dataclass
class PipelineConfig:
    base_dir: str
    similarity_threshold: float = 0.935  # reference default resolver.py:251
    blocking: B.BlockingConfig = field(default_factory=B.BlockingConfig)
    scoring: SC.ScoringConfig = field(default_factory=SC.ScoringConfig)
    exact_match_cols: tuple[str, ...] = ("doc",)
    use_negative_constraint: bool = False  # needs an edges table
    # alpha > 0 clustering: per-round relational re-scoring (operators/
    # iterative.py, reference resolver.py:655-801). Needs an edges table.
    rel_strategy: str = "jaccard_coef"
    iterative_max_rounds: int = 10
    # non-max linkage clustering (operators/linkage.py); 'max' keeps the
    # thresholded-CC fast path
    linkage: str = "max"
    run_id: str | None = None


class Pipeline:
    """Stage runner. ``run()`` executes (or resumes) the whole graph."""

    def __init__(self, spark: SparkSession, cfg: PipelineConfig):
        self.spark = spark
        self.cfg = cfg
        self.run_id = cfg.run_id or uuid.uuid4().hex[:12]
        os.makedirs(cfg.base_dir, exist_ok=True)

    # -- plumbing -----------------------------------------------------------

    def _path(self, stage: str) -> str:
        return os.path.join(self.cfg.base_dir, stage)

    def _metrics_path(self) -> str:
        return os.path.join(self.cfg.base_dir, "_metrics")

    def _append_metrics(self, rows: list[dict]) -> None:
        from .. import schemas

        df = self.spark.createDataFrame(
            [
                (
                    r["run_id"],
                    r["stage"],
                    r.get("partition_id"),
                    r.get("rows_out"),
                    r.get("wall_ms"),
                    json.dumps(r.get("extra", {})),
                )
                for r in rows
            ],
            schema=schemas.STAGE_METRICS,
        )
        df.coalesce(1).write.mode("append").parquet(self._metrics_path())

    def _run_stage(
        self, stage: str, build, resume: bool = True, extra: dict | None = None
    ) -> DataFrame:
        """Build-or-load one committed stage + lineage/metrics accounting."""
        path = self._path(stage)
        if resume and TBL.is_committed(path):
            return TBL.read_table(self.spark, path)
        t0 = time.time()
        df = build()
        TBL.write_table(df, path, extra_manifest={"run_id": self.run_id, "stage": stage})
        out = TBL.read_table(self.spark, path)
        wall_ms = int((time.time() - t0) * 1000)
        per_part = (
            out.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .count()
            .collect()
        )
        rows = [
            {
                "run_id": self.run_id,
                "stage": stage,
                "partition_id": int(p["_pid"]),
                "rows_out": int(p["count"]),
                "wall_ms": wall_ms,
                "extra": extra or {},
            }
            for p in per_part
        ] or [
            {
                "run_id": self.run_id,
                "stage": stage,
                "partition_id": None,
                "rows_out": 0,
                "wall_ms": wall_ms,
                "extra": extra or {},
            }
        ]
        self._append_metrics(rows)
        return out

    # -- stages --------------------------------------------------------------

    def run(
        self,
        transcripts: DataFrame,
        labels: DataFrame | None = None,
        edges: DataFrame | None = None,
        resume: bool = True,
    ) -> dict:
        cfg = self.cfg

        docs = self._run_stage(
            "docs", lambda: CAN.canonical_docs(transcripts), resume
        )

        dft = self._run_stage("df_table", lambda: doc_frequencies(docs), resume)
        corpus_size = docs.count()
        tdict = self._run_stage(
            "token_dict", lambda: B.token_dictionary(dft), resume
        )

        blocks = self._run_stage(
            "blocks", lambda: B.build_blocks(docs, tdict, cfg.blocking), resume
        )
        self._run_stage(
            "block_metrics",
            lambda: B.block_size_metrics(blocks, cfg.blocking),
            resume,
        )
        pairs = self._run_stage(
            "pairs", lambda: B.candidate_pairs(blocks, cfg.blocking), resume
        )

        # with the iterative alpha path the rel mix-in happens per merge
        # round (operators/iterative.py), so the scoring stage computes the
        # attribute kernels only — alpha is applied downstream
        iterative = cfg.scoring.alpha > 0 and edges is not None
        score_cfg = (
            dataclasses.replace(cfg.scoring, alpha=0.0) if iterative else cfg.scoring
        )
        scored = self._run_stage(
            "scores",
            lambda: SC.score_pairs(
                pairs,
                docs,
                score_cfg,
                df_table=dft,
                corpus_size=corpus_size,
                spark=self.spark,
            ),
            resume,
        )

        exact_edges = self._run_stage(
            "bootstrap_edges",
            lambda: BS.exact_match_edges(docs, list(cfg.exact_match_cols)),
            resume,
        )

        def exact_preclusters():
            # star edges -> (conv_id, cluster_id) pre-clusters for the merge
            # loops (the reference bootstraps exact matches before clustering)
            m = exact_edges.select(
                F.col("id2").alias("conv_id"), F.col("id1").alias("cluster_id")
            )
            return (
                docs.select("conv_id")
                .join(m, "conv_id", "left")
                .select(
                    "conv_id",
                    F.coalesce("cluster_id", F.col("conv_id")).alias("cluster_id"),
                )
            )

        if iterative:
            # C5: round-synchronous relational re-scoring until fixpoint —
            # merged clusters change neighborhoods, so rel features must be
            # recomputed as merging proceeds (reference resolver.py:655-801)
            from ..operators.iterative import resolve_iterative

            clusters = self._run_stage(
                "clusters",
                lambda: resolve_iterative(
                    scored.select("id1", "id2", "attr_sim"),
                    docs,
                    edges,
                    alpha=cfg.scoring.alpha,
                    threshold=cfg.similarity_threshold,
                    rel_strategy=cfg.rel_strategy,
                    linkage=cfg.linkage,
                    max_rounds=cfg.iterative_max_rounds,
                    initial_assignment=exact_preclusters(),
                ),
                resume,
            )
        elif cfg.linkage != "max":
            # G2: min/average linkage agglomerative merging
            from ..operators.linkage import linkage_clustering

            clusters = self._run_stage(
                "clusters",
                lambda: linkage_clustering(
                    scored.select("id1", "id2", "sim"),
                    docs,
                    cfg.similarity_threshold,
                    linkage=cfg.linkage,
                    initial_assignment=exact_preclusters(),
                ),
                resume,
            )
        else:

            def build_cluster_edges():
                e = scored.filter(
                    F.col("sim") >= cfg.similarity_threshold
                ).select("id1", "id2").unionByName(exact_edges).distinct()
                if cfg.use_negative_constraint and edges is not None:
                    e = BS.negative_constraint_filter(e, edges)
                return e

            cluster_edges = self._run_stage(
                "cluster_edges", build_cluster_edges, resume
            )

            clusters = self._run_stage(
                "clusters",
                lambda: CC.assign_clusters(
                    docs, CC.connected_components(cluster_edges)
                ),
                resume,
            )

        result = {
            "run_id": self.run_id,
            "n_docs": corpus_size,
            "n_pairs": pairs.count(),
            "n_clusters": clusters.select("cluster_id").distinct().count(),
            "clusters_path": self._path("clusters"),
        }

        if labels is not None:
            from .. import evaluate as E

            s = E.pairwise_precision_recall(labels, clusters)
            result.update(
                {"precision": s.precision, "recall": s.recall, "f1": s.f1}
            )
            self._append_metrics(
                [
                    {
                        "run_id": self.run_id,
                        "stage": "evaluate",
                        "extra": {
                            "precision": s.precision,
                            "recall": s.recall,
                            "f1": s.f1,
                        },
                    }
                ]
            )
        return result
