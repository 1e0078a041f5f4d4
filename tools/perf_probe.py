"""One-off perf probe: time named driver queries at a given SF/core count.

Usage: python tools/perf_probe.py <cpus> <sf_dir> <query> [<query> ...]
Prints per-query wall seconds + JVM GC time delta per query.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gc_ms(spark):
    """Total GC millis across the JVM's collectors (driver == executor in local)."""
    jvm = spark.sparkContext._jvm
    mgmt = jvm.java.lang.management.ManagementFactory
    total = 0
    it = mgmt.getGarbageCollectorMXBeans().iterator()
    while it.hasNext():
        total += it.next().getCollectionTime()
    return total


def main():
    cpus = sys.argv[1]
    sf_dir = sys.argv[2]
    names = sys.argv[3:]

    from entityresolution_capstone_spark.session import get_spark

    spark = get_spark(
        app_name="perf-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from entityresolution_capstone_spark.plans import driver_queries as DQ

    out = {}
    for name in names:
        fn = DQ.QUERIES[name]
        g0 = gc_ms(spark)
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        g1 = gc_ms(spark)
        out[name] = {"wall_s": round(wall, 2), "rows": n, "gc_s": round((g1 - g0) / 1000.0, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"cpus": int(cpus), "sf": sf_dir, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
