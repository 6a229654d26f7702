"""SparkSession factory with scale-oriented defaults.

Settings chosen for the 1000-executor / 100 TB target and harmless on
local[*]: AQE on (runtime coalescing, skew-join splitting), Arrow for any
pandas interchange, UTC session timezone so epoch arithmetic matches
external oracles regardless of cluster locale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "caspr_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # parquet files written without isAdjustedToUTC would otherwise
        # infer TIMESTAMP_NTZ (Spark 4 default), which watermarks reject
        # and which diverges from the UTC-session TIMESTAMP the oracles
        # compare against — read them as session-TZ timestamps instead
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus)))
        # parquet scans: keep splits big enough to amortize task overhead
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
