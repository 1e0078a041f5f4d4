"""Probe the er_clusters edges+cc step costs at a core count."""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    cpus, sf_dir = sys.argv[1], sys.argv[2]
    from pyspark.sql import functions as F

    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="edges-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import entityresolution_capstone_spark.plans.driver_queries as DQ
    from entityresolution_capstone_spark.operators.bootstrap import exact_match_edges
    from entityresolution_capstone_spark.operators.cc import connected_components

    t = DQ.derive_transcripts(spark, sf_dir)
    docs = DQ.canonical_docs(t, prefix_len=DQ.PREFIX).persist()
    docs.count()

    out = {}

    def timed(name, fn):
        t0 = time.time()
        n = fn()
        out[name] = {"wall_s": round(time.time() - t0, 2), "rows": n}
        print(json.dumps({name: out[name]}), flush=True)

    timed("exact_match", lambda: exact_match_edges(docs, ["doc"]).count())
    # synthetic 49-edge set mimicking the threshold output
    edges = (
        docs.select("conv_id").limit(100)
        .select(F.col("conv_id").alias("id1"), F.concat(F.lit("x"), "conv_id").alias("id2"))
        .localCheckpoint(eager=True)
    )
    timed("cc_tiny", lambda: connected_components(edges, checkpoint=False).count())
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
