"""SparkSession factory with the scale-oriented defaults this engine assumes.

Local mode here is the test harness; the configs are chosen to be the ones
that also hold on a 1000-executor cluster: AQE on (runtime coalesce + skew
split), Arrow transfer for every pandas UDF, explicit shuffle parallelism,
UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "ocr_module_spark", cores: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    builder = (
        SparkSession.builder
        .master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # shuffle/spill scratch dir is strictly opt-in (SPARK_GRAFT_LOCAL_DIR):
    # defaulting to /dev/shm would silently cap spill capacity at ~50% of
    # RAM and change behavior based on tmpfs presence. The bench scripts
    # pass it explicitly (VM disks are slow/spiky); a real cluster uses
    # local NVMe via spark.local.dir cluster config.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
