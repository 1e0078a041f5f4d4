"""Stepwise timing of the real q_er_clusters flow (memoized helpers)."""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    cpus, sf_dir = sys.argv[1], sys.argv[2]
    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="clusters-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    import entityresolution_capstone_spark.plans.driver_queries as DQ

    out = {}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 2)
        print(json.dumps({name: out[name]}), file=sys.stderr, flush=True)
        return r

    timed("pairs_eager", lambda: DQ._er_pairs(spark, sf_dir).count())
    timed("scored_eager", lambda: DQ._er_scored(spark, sf_dir).count())
    timed("clusters", lambda: DQ.q_er_clusters(spark, sf_dir).count())
    print(json.dumps({"cpus": int(cpus), "steps": out}))
    spark.stop()


if __name__ == "__main__":
    main()
