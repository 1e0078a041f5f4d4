"""spark-submit entry point for the full resolution pipeline.

    spark-submit --py-files pipeline.zip main.py \
        --transcripts /data/transcripts.parquet \
        --labels /data/labels.parquet \
        --base-dir /data/run1 \
        --threshold 0.38 --weights jw=0.3,lev=0.2,tfidf=0.5 \
        [--no-resume] [--synthetic]

Prints a one-line JSON result (paths, counts, metrics). Re-running with the
same --base-dir resumes from the last committed stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def parse_weights(s: str) -> dict[str, float]:
    out = {}
    for part in s.split(","):
        k, v = part.split("=")
        out[k.strip()] = float(v)
    return out


def prep_main(argv: list[str]) -> int:
    """`main.py prep-arxiv|prep-citeseer` — CLI parity with the reference's
    console entry points (scripts.py:36-77, setup.py:20-24)."""
    name = argv[0].removeprefix("prep-")
    ap = argparse.ArgumentParser(prog=f"main.py {argv[0]}")
    ap.add_argument("--data", required=True, help=f"path of the {name} .dat file")
    ap.add_argument("--graph", default="graph.json", help="output graph json dir")
    ap.add_argument(
        "--ground-truth", default="ground_truth.json", help="output ground truth json dir"
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv[1:])

    from entityresolution_capstone_spark.session import get_spark
    from entityresolution_capstone_spark.sources.legacy import prep_dat

    spark = get_spark(app_name=f"ercs-{argv[0]}", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    prep_dat(spark, args.data, args.graph, args.ground_truth, name=name)
    print(json.dumps({"graph": args.graph, "ground_truth": args.ground_truth}))
    spark.stop()
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] in ("prep-arxiv", "prep-citeseer"):
        return prep_main(argv)
    ap = argparse.ArgumentParser(description="PySpark entity-resolution pipeline")
    ap.add_argument("--transcripts", help="parquet path of transcript turns")
    ap.add_argument("--labels", help="optional parquet path of ground-truth labels")
    ap.add_argument("--base-dir", required=True, help="stage-table directory")
    ap.add_argument("--threshold", type=float, default=0.38)
    ap.add_argument("--weights", type=parse_weights, default={"jw": 0.3, "lev": 0.2, "tfidf": 0.5})
    ap.add_argument("--alpha", type=float, default=0.0)
    ap.add_argument("--max-block-size", type=int, default=200)
    ap.add_argument("--salt-block-size", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--synthetic", action="store_true", help="use the seeded synthetic corpus")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from entityresolution_capstone_spark import datagen
    from entityresolution_capstone_spark.operators.blocking import BlockingConfig
    from entityresolution_capstone_spark.operators.scoring import ScoringConfig
    from entityresolution_capstone_spark.plans.pipeline import Pipeline, PipelineConfig
    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(app_name="ercs-pipeline", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        transcripts, labels = datagen.corpus_dataframes(spark)
    else:
        if not args.transcripts:
            ap.error("--transcripts required unless --synthetic")
        transcripts = spark.read.parquet(args.transcripts)
        labels = spark.read.parquet(args.labels) if args.labels else None

    cfg = PipelineConfig(
        base_dir=args.base_dir,
        similarity_threshold=args.threshold,
        blocking=BlockingConfig(
            max_block_size=args.max_block_size,
            salt_block_size=args.salt_block_size,
        ),
        scoring=ScoringConfig(weights=args.weights, alpha=args.alpha),
    )
    result = Pipeline(spark, cfg).run(
        transcripts, labels=labels, resume=not args.no_resume
    )
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
