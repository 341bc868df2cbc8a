"""SparkSession factory tuned for the whisper engine.

Local testing runs ``local[N]``; the configs below are the ones that
matter identically on a 1000-executor cluster: AQE on (skew joins,
runtime coalescing), shuffle partitions sized to cores, UTC session
timezone (whisper is calendar-free integer-seconds math), Arrow enabled
for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "go_whisper_spark", cpus: "int | None" = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0") or 0) or os.cpu_count() or 4
    # Shuffle partitions: local benches run MB-scale inputs where task-
    # scheduling overhead dominates — 8 post-shuffle partitions measured
    # ~3x faster than 32 on the dedup joins.  On a real cluster size
    # this to 2-3x total cores (or rely on AQE initialPartitionNum);
    # AQE still coalesces/splits at runtime either way.
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    return builder.getOrCreate()
