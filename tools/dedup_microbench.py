"""Isolate the q_dedup anti-scaling: enumeration vs verify, payload-filter vs
distinct, at a given core count.

Usage: python tools/dedup_microbench.py <cpus> <sf_dir> <mode ...>
modes: enum_payload enum_distinct verify_full
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
        app_name="dedup-micro",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from entityresolution_capstone_spark.operators import dedup as D
    from entityresolution_capstone_spark.plans.driver_queries import _MH, load

    docs = D.prepare_docs(load(spark, sf_dir, "documents"))
    tdict = D.dedup_token_dict(docs)

    out = {}
    for mode in modes:
        t0 = time.time()
        if mode == "enum_payload":
            n = D.minhash_candidate_pairs(docs, tdict, _MH).count()
        elif mode == "enum_distinct":
            buckets = D.minhash_band_buckets(docs, tdict, _MH)
            n = D.bucket_pairs(
                buckets,
                salt_bucket_size=_MH.salt_bucket_size,
                salt_factor=_MH.salt_factor,
            ).count()
        elif mode in ("verify_array", "verify_explode"):
            cand = D.minhash_candidate_pairs(docs, tdict, _MH).persist()
            cand.count()
            t0 = time.time()
            n = D.token_jaccard_verify(
                cand, docs, _MH.jaccard_threshold, strategy=mode.split("_")[1]
            ).count()
            cand.unpersist()
        else:
            raise SystemExit(f"unknown mode {mode}")
        out[mode] = {"wall_s": round(time.time() - t0, 2), "rows": n}
        print(json.dumps({mode: out[mode]}), flush=True)
    print(json.dumps({"cpus": int(cpus), "modes": out}))
    spark.stop()


if __name__ == "__main__":
    main()
# appended modes handled above via sys.argv; verify_array / verify_explode
