"""SparkSession factory tuned for this engine.

Local-mode settings follow the public Spark tuning guidance: shuffle
partitions ~ cores (not the 200 default), AQE on (runtime coalescing +
skew-join splitting), Arrow on for the pandas-UDF text stage, session
timezone pinned to UTC so results compare bit-stably against the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "turboxsl_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` else ``*``. On a real
    cluster the same code runs unchanged under ``spark-submit``; only
    ``master`` differs (we never set it if one is already configured by
    the submitter).
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cores) * 2, 8)
        except (TypeError, ValueError):
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # single-node sandbox: route shuffle spill through tmpfs so the one
    # local disk doesn't serialize what a cluster spreads over many disks
    if os.path.isdir("/dev/shm") and "SPARK_LOCAL_DIRS" not in os.environ:
        shm = "/dev/shm/spark-local"
        os.makedirs(shm, exist_ok=True)
        builder = builder.config("spark.local.dir", shm)
    # local testdata files are far smaller than the 128MB default split,
    # which would give single-task scans; 8MB keeps every core fed.
    # (On a real cluster with TB-scale files the default is correct.)
    builder = builder.config(
        "spark.sql.files.maxPartitionBytes",
        os.environ.get("SPARK_MAX_PARTITION_BYTES", str(8 * 1024 * 1024)),
    )
    # AQE's 64MB advisory target coalesces small-scale shuffles below the
    # core count (observed: 19 partitions on 16 cores → 1.2 waves + tail).
    # 8MB keeps ≥2 partitions per core at sandbox scale; harmless on big data.
    builder = builder.config(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        os.environ.get("SPARK_ADVISORY_PARTITION_BYTES", str(8 * 1024 * 1024)),
    )
    # Respect an externally-provided master (spark-submit); else local.
    if "SPARK_MASTER" in os.environ:
        builder = builder.master(os.environ["SPARK_MASTER"])
    else:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
