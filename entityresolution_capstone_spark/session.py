"""SparkSession factory tuned for the record-linkage pipeline.

Defaults are chosen for the sandbox (``local[N]``) but every knob matters at
cluster scale too: Arrow for pandas-UDF transport, AQE (+ skew-join splitting)
for runtime re-planning of the blocking self-join, an explicit checkpoint
directory so connected-components rounds can cut lineage, and a shuffle
partition count sized to the parallelism level.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    except ValueError:
        return 32


def _ram_local_dir(min_free_bytes: int = 16 * (1 << 30)) -> str | None:
    """RAM-backed shuffle scratch for local mode, if it has headroom.

    Local-mode shuffle/spill defaults to /tmp, which on this box is a
    virtio ext4 disk: under a 32-thread shuffle the kernel IO path dominates
    (measured ~45% system time, ~1% user) and the scoring stage collapses —
    288.6s vs 51.4s for the identical q_score job at local[32] with the only
    change being spark.local.dir on tmpfs (bit-identical result checksum).
    On a real cluster the resource manager points spark.local.dir at fast
    local NVMe; a RAM-backed tmpfs is the local-mode equivalent. Only used
    when /dev/shm exists with comfortable free space; callers can always
    override via extra_conf["spark.local.dir"].
    """
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize < min_free_bytes:
            return None
        d = "/dev/shm/ercs-local"
        os.makedirs(d, exist_ok=True)
        return d
    except OSError:
        return None


def get_spark(
    app_name: str = "entityresolution-capstone-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    checkpoint_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with pipeline-appropriate defaults.

    Parameters mirror what a ``spark-submit`` wrapper would set via ``--conf``;
    on a real cluster the master/memory flags come from the launcher and only
    the SQL-level settings below matter.
    """
    cpus = default_parallelism()
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Arrow transport for pandas UDFs (vectorized kernels; no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # AQE: runtime coalescing + skew-join splitting for the blocking self-join.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Keep scans splittable at the target SF.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # Let HotSpot JIT the LARGE whole-stage-codegen methods. The static
        # kernels this engine leans on (the vocab-wide TF-IDF dot, fixed-dim
        # vector dots, SimHash/MinHash band expressions) expand to a few
        # hundred scalar ops per generated method — past HotSpot's default
        # DontCompileHugeMethods threshold (8000 bytecodes), so the method
        # silently runs in the BYTECODE INTERPRETER. Measured on the bench
        # scoring stage (vocab 31, 6.2M pairs, r5): 35-40x task-CPU
        # reduction from this flag alone (392->11 core-s at local[16]), and
        # the interpreter's icache/dispatch footprint was the largest
        # per-core-inflation term in the N-vs-4N scaling gap. On a real
        # cluster pass the same via spark.executor.defaultJavaOptions (set
        # below; executors are separate JVMs there). defaultJavaOptions (not
        # extraJavaOptions) so user-supplied extra options still compose.
        .config(
            "spark.driver.defaultJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
        )
        .config(
            "spark.executor.defaultJavaOptions",
            "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m",
        )
    )
    if master.startswith("local") and "spark.local.dir" not in (extra_conf or {}):
        ram_dir = _ram_local_dir()
        if ram_dir:
            builder = builder.config("spark.local.dir", ram_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    if checkpoint_dir is None:
        checkpoint_dir = os.path.join(
            tempfile.gettempdir(), "ercs_checkpoints", spark.sparkContext.applicationId
        )
    spark.sparkContext.setCheckpointDir(checkpoint_dir)
    return spark
