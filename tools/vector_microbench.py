"""8-vs-32-core inversion check for the round-4 rewrites (VERDICT r3 item 2).

Each mode is one of the paths whose interpreted array expressions
(zip_with/aggregate/array_intersect on a pair or score stream) were replaced
by static codegen expressions, packed-int64 bit algebra, or Arrow-batched
NumPy kernels. Run the same mode at two core counts on the same input; the
round-3 law says the OLD forms anti-scale (wall grows with cores) while the
rewrites must not.

Usage: python tools/vector_microbench.py <cpus> <sf_dir> <mode ...>
modes: embdedup simhash annbuckets ivf project mixedpairs brute
Prints one JSON line per mode + a summary line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = sys.argv[1]
    sf_dir = sys.argv[2]
    modes = sys.argv[3:]

    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="vector-micro",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from entityresolution_capstone_spark.operators import blocking as B
    from entityresolution_capstone_spark.operators import dedup as D
    from entityresolution_capstone_spark.operators import similarity_search as S
    from entityresolution_capstone_spark.plans.driver_queries import load

    emb = load(spark, sf_dir, "embeddings")
    out = {}
    for mode in modes:
        t0 = time.time()
        if mode == "embdedup":
            n = D.embedding_cosine_duplicates(emb, threshold=0.2, bucketed=True).count()
        elif mode == "simhash":
            docs = load(spark, sf_dir, "documents")
            n = D.simhash_duplicates(docs).count()
        elif mode == "annbuckets":
            n = S.lsh_bucket_keys(emb).count()
        elif mode == "ivf":
            q = emb.filter(F.col("vec_id") % 53 == 7)
            n = S.ivf_topk(emb, q, k=10).count()
        elif mode == "project":
            n = S.random_project(emb, out_dim=16).count()
        elif mode == "mixedpairs":
            # the generic candidate_pairs path: token keys + minhash bands
            # (SURVEY §2.3's prescribed mix) -> dense-id payload + Arrow
            # kernel predicate instead of array_min(array_intersect(...))
            from entityresolution_capstone_spark.plans.driver_queries import (
                PREFIX,
                derive_transcripts,
            )
            from entityresolution_capstone_spark.operators.canonicalize import (
                canonical_docs,
            )
            from entityresolution_capstone_spark.functions.tfidf import (
                doc_frequencies,
            )

            docs = canonical_docs(
                derive_transcripts(spark, sf_dir), prefix_len=PREFIX
            ).persist()
            tdict = B.token_dictionary(doc_frequencies(docs))
            cfg = B.BlockingConfig(use_token_keys=True, use_minhash=True)
            blocks = B.build_blocks(docs, tdict, cfg)
            n = B.candidate_pairs(blocks, cfg).count()
        elif mode == "brute":
            q = emb.filter(F.col("vec_id") % 997 == 7)
            n = S.brute_force_topk(emb, q, k=10).count()
        else:
            raise SystemExit(f"unknown mode {mode}")
        out[mode] = {"wall_s": round(time.time() - t0, 2), "rows": n}
        print(json.dumps({mode: out[mode]}), flush=True)
    print(json.dumps({"cpus": int(cpus), "modes": out}))
    spark.stop()


if __name__ == "__main__":
    main()
