"""Decompose the q_score scoring stage: JVM plan floor vs Arrow transport
vs kernel compute.

Builds the bench pair stream once (persisted), then times the same
fused-projection aggregate with:
  jvm    — char kernel replaced by a literal (no Python at all)
  noop   — pandas UDF that ships both prefix columns through Arrow and
           returns zeros without computing (transport + worker floor)
  enc    — UDF that encodes+compacts each chunk but skips jw/lev
  full   — the real fused jw+lev kernel
Each mode min-of-k. Usage: python tools/score_kernel_probe.py [cpus] [sf_dir] [trials]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="score-kernel-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from entityresolution_capstone_spark.functions import similarity as S
    from entityresolution_capstone_spark.functions.tfidf import doc_frequencies
    from entityresolution_capstone_spark.operators.canonicalize import canonical_docs
    from entityresolution_capstone_spark.plans import driver_queries as DQ

    BENCH_BLOCKING = DQ.B.BlockingConfig(
        use_token_keys=False, use_minhash=True, minhash_rows=4, minhash_bands=4,
        seed=7, max_block_size=5000, salt_block_size=400, salt_factor=8,
    )
    PFX = 128
    t = DQ.derive_transcripts(spark, sf_dir)
    docs = canonical_docs(t, prefix_len=PFX).persist()
    dft = doc_frequencies(docs).persist()
    tdict = DQ.B.token_dictionary(dft)
    blocks = DQ.B.build_blocks(docs, tdict, BENCH_BLOCKING)
    pairs = DQ.B.candidate_pairs(blocks, BENCH_BLOCKING).repartition(128).persist()
    n_pairs = pairs.count()
    d1 = docs.select(F.col("conv_id").alias("id1"), F.col("doc_prefix").alias("p1"))
    d2 = docs.select(F.col("conv_id").alias("id2"), F.col("doc_prefix").alias("p2"))
    feat = pairs.join(F.broadcast(d1), "id1").join(F.broadcast(d2), "id2")

    max_len = PFX

    @pandas_udf("double")
    def noop_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(np.zeros(len(s1)))

    @pandas_udf("double")
    def enc_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        x = s1.to_numpy(dtype=object)
        y = s2.to_numpy(dtype=object)
        n = len(x)
        out = np.zeros(n, dtype=np.float64)
        for lo in range(0, n, S.KERNEL_CHUNK):
            hi = min(lo + S.KERNEL_CHUNK, n)
            a, la = S._encode_batch(x[lo:hi], max_len)
            b, lb = S._encode_batch(y[lo:hi], max_len)
            a, b = S._compact_codes(a, b)
            out[lo:hi] = la + lb
        return pd.Series(out)

    full_udf = S.make_weighted_char_sim_udf({"jw": 0.6, "lev": 0.4}, max_len=max_len)

    modes = {
        "jvm": (F.length("p1") + F.length("p2")).cast("double"),
        "noop": noop_udf("p1", "p2"),
        "enc": enc_udf("p1", "p2"),
        "full": full_udf("p1", "p2"),
    }
    # warm the worker pool
    feat.limit(1000).select(noop_udf("p1", "p2").alias("s")).agg(F.sum("s")).collect()
    feat.limit(1000).select(full_udf("p1", "p2").alias("s")).agg(F.sum("s")).collect()

    out = {}
    for name, col in modes.items():
        ts = []
        for _ in range(trials):
            t0 = time.time()
            feat.select(col.alias("s")).agg(F.sum("s")).collect()
            ts.append(round(time.time() - t0, 2))
        out[name] = ts
        print(json.dumps({name: ts, "min": min(ts)}), flush=True)
    print(json.dumps({"n_pairs": n_pairs, "modes": {k: min(v) for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
