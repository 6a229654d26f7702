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


def configure_for_scale(spark: SparkSession, input_bytes: int,
                        target_partition_bytes: int = 128 * 1024 * 1024,
                        max_shuffle_partitions: int = 200_000) -> dict:
    """Size the runtime-settable shuffle knobs for a known input volume —
    the arithmetic a 100 TB job does before its first wide stage.

    ``spark.sql.shuffle.partitions`` becomes
    ``ceil(input_bytes / target_partition_bytes)`` clamped to
    [2 × default parallelism, ``max_shuffle_partitions``]: partitions
    sized ~128 MiB fit executor memory without spilling, while the
    floor keeps small inputs from serializing onto a handful of cores.
    With AQE on (the factory default) this is the *initial* partition
    count that AQE coalesces DOWN from — overshooting slightly is
    cheap, undershooting causes spill — so the estimate only needs to
    be order-of-magnitude right. Returns the applied settings.

    Static configs (executor memory, ``files.maxPartitionBytes``) can't
    change on a live session; the factory sets them at build time.
    """
    if input_bytes < 0:
        raise ValueError(f"input_bytes must be >= 0, got {input_bytes}")
    parallelism = spark.sparkContext.defaultParallelism
    want = -(-input_bytes // target_partition_bytes)   # ceil
    shuffle = int(min(max_shuffle_partitions,
                      max(2 * parallelism, want)))
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
    # wide-row guard: advisory size AQE coalesces toward
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                   str(target_partition_bytes))
    return {"shuffle_partitions": shuffle,
            "advisory_partition_bytes": target_partition_bytes,
            "default_parallelism": parallelism}
