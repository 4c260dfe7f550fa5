"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100TB/10^10-frontier design (SURVEY §4): AQE with
skew-join handling on (politeness groups are host-skewed by construction),
runtime bloom-filter join pruning for the seen anti-join probe, Arrow for
every pandas UDF boundary, and shuffle partitions scaled with cores locally
(on a real cluster this is set per-job via spark-submit conf).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "crawler-spark",
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict | None = None,
) -> SparkSession:
    if master is None:
        cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        master = f"local[{cores}]"
    else:
        cores = cores or 32
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # scans must out-split the core count even for GB-scale local
        # corpora (splits only land on parquet row-group boundaries)
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "32768")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # right-size JVM internal pools (GC workers, C2 compiler, netty)
        # to the granted core count: in local[N] mode the JVM otherwise
        # sizes them for every ADVERTISED cpu (~23 GC threads on a 32-vCPU
        # box even when N=2), oversubscribing the actual allotment —
        # the container/cgroup right-sizing any production deploy does
        .config("spark.driver.extraJavaOptions",
                f"-XX:ActiveProcessorCount={cores}")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
