"""Static-vs-Arrow cosine crossover per PLAN SHAPE (VERDICT r5 item 5).

The r5 crossover (static 3.91s vs arrow 5.67s) was measured on the bucketed
sort-merge-join stream only, and q_topk proved it does not transfer: under a
BroadcastNestedLoopJoin there is NO whole-stage codegen, so the static
dim-unrolled expression runs interpreted per pair. This tool measures the
full matrix once:

    {SMJ bucketed pair stream, BNLJ broadcast crossJoin} x {static, arrow}
    x dim {64, 256, 768}

(static refuses dim 768 by contract — cells marked "refused"). Input:
deterministic hash-random vectors from vector_microbench.make_input.

Usage: python tools/crossover_microbench.py [cpus] [n_vecs] [trials]
Writes BENCH/CROSSOVER_PLANSHAPE.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/dev/shm/ercs-crossover"


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    n_vecs = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from tools.vector_microbench import make_input

    from pyspark.sql import functions as F

    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="crossover-microbench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from entityresolution_capstone_spark.operators import dedup as D
    from entityresolution_capstone_spark.operators import similarity_search as S

    out: dict = {"cpus": int(cpus), "n_vecs": n_vecs, "trials": trials, "cells": {}}
    for dim in (64, 256, 768):
        d = os.path.join(SCRATCH, f"d{dim}")
        if not os.path.exists(os.path.join(d, "embeddings.parquet")):
            make_input(d, n_vecs, None, dim)
        emb = spark.read.parquet(os.path.join(d, "embeddings.parquet")).persist()
        emb.count()
        queries = emb.filter(F.col("vec_id") < 200)
        for kernel in ("static", "arrow"):
            # SMJ/bucketed stream: LSH-bucketed embedding dedup
            key = f"smj_dim{dim}_{kernel}"
            if kernel == "static" and dim > 256:
                out["cells"][key] = "refused (dim > MAX_STATIC_DIM)"
            else:
                ts = []
                for _ in range(trials):
                    t0 = time.time()
                    n = D.embedding_cosine_duplicates(
                        emb, threshold=0.8, bucketed=True, kernel=kernel
                    ).count()
                    ts.append(round(time.time() - t0, 2))
                out["cells"][key] = {"min_s": min(ts), "trials": ts, "rows": n}
            print(json.dumps({key: out["cells"][key]}), flush=True)
            # BNLJ broadcast: brute-force top-k
            key = f"bnlj_dim{dim}_{kernel}"
            if kernel == "static" and dim > 256:
                out["cells"][key] = "refused (dim > MAX_STATIC_DIM)"
            else:
                ts = []
                for _ in range(trials):
                    t0 = time.time()
                    n = S.brute_force_topk(emb, queries, k=10, kernel=kernel).count()
                    ts.append(round(time.time() - t0, 2))
                out["cells"][key] = {"min_s": min(ts), "trials": ts, "rows": n}
            print(json.dumps({key: out["cells"][key]}), flush=True)
        emb.unpersist()

    out["rule"] = (
        "kernel=auto resolves: ARROW under BNLJ/broadcast-crossJoin plans "
        "(no whole-stage codegen -> static runs interpreted) and above "
        "MAX_STATIC_DIM; STATIC under codegen-capable joins (SMJ/SHJ/BHJ "
        "bucketed streams) at dim <= MAX_STATIC_DIM when the JVM JITs huge "
        "methods (probed)."
    )
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "CROSSOVER_PLANSHAPE.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path}))
    spark.stop()


if __name__ == "__main__":
    main()
