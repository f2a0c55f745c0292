"""SparkSession factory tuned for the local[N] harness and oracle parity.

Scale notes (100 TB target): every knob here is a *local-mode stand-in* for a
cluster setting — AQE handles runtime coalesce/skew on a real cluster, UTC
session timezone keeps results portable, Arrow keeps the pandas-UDF path
(embedding providers, KNN kernels) batched instead of row-at-a-time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "penr-oz-agent-memory-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    master: str | None = None,
    max_partition_bytes: str | None = None,
    ui_enabled: bool = False,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (else all cores). Shuffle
    partitions default to the core count — correct for local mode where 200
    default partitions just add scheduling overhead on small-SF data; on a
    real cluster AQE coalesces to the right number at runtime anyway.

    ``max_partition_bytes`` defaults to 4 MB **only on a local master**:
    the test corpus ships as one parquet file per table, so the 128 MB
    default split would make every scan a single task on a 32-core box. On
    any non-local master the setting is left at Spark's default — 4 MB
    splits against standard ~128 MB row groups would map most tasks to no
    row-group midpoint (empty tasks) and explode task counts.

    ``ui_enabled`` turns the Spark UI (and its REST metrics API) on for
    probes that read per-stage shuffle volumes; off by default — the UI
    server costs startup time the bench/test sessions never repay.
    """
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 4)
        except (TypeError, ValueError):
            shuffle_partitions = 32
    master = master or f"local[{cpus}]"
    if max_partition_bytes is None and master.startswith("local"):
        max_partition_bytes = "4m"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "true" if ui_enabled else "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if max_partition_bytes is not None:
        builder = builder.config("spark.sql.files.maxPartitionBytes", max_partition_bytes)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
