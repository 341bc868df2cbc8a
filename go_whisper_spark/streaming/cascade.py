"""Multi-level streaming cascade: watermark-windowed level 0 plus
incremental consolidation of the lower archives per micro-batch.

Structured Streaming supports one stateful windowed aggregation per
query, but whisper's cascade is N levels deep [ref: whisper.go (Update —
propagate loop)].  The production pattern is ``foreachBatch``: the
streaming query maintains archive 0 (LWW tumbling windows + watermark,
``streaming_rollup``), and each emitted micro-batch triggers a *batch*
consolidation of only the touched day partitions in every lower
archive — identical math to ``retention.incremental_rollup``, driven by
the stream.

Scale: per micro-batch work is O(batch ∪ touched days) per level; the
archive tables are the same day-partitioned parquet layout the batch
engine writes, so readers can't tell which path produced a row.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_whisper_spark.functions.bucketing import align_interval, xff_gated_agg
from go_whisper_spark.model import SeriesConfig
from go_whisper_spark.retention import archive_path
from go_whisper_spark.streaming.rollup import streaming_rollup


def _consolidate_touched(
    spark: SparkSession, base: str, cfg: SeriesConfig, touched_days
) -> None:
    """Recompute archives 1..N for the given day partitions from the
    level-0 store (dynamic partition overwrite)."""
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        level = (
            spark.read.parquet(archive_path(base, 0))
            .where(F.col("day").isin(touched_days))
            .select("metric", "interval", "value")
        )
        for i in range(1, len(cfg.retentions)):
            fine, coarse = cfg.retentions[i - 1], cfg.retentions[i]
            per_bucket = coarse.seconds_per_point // fine.seconds_per_point
            level = (
                level.withColumn(
                    "coarse_interval",
                    align_interval("interval", coarse.seconds_per_point),
                )
                .groupBy("metric", "coarse_interval")
                .agg(
                    xff_gated_agg(
                        cfg.aggregation_method, cfg.x_files_factor, per_bucket
                    ).alias("value")
                )
                .withColumnRenamed("coarse_interval", "interval")
                .where(F.col("value").isNotNull())
            )
            out = level.withColumn(
                "day", F.to_date(F.timestamp_seconds(F.col("interval")))
            ).where(F.col("day").isin(touched_days))
            (
                out.repartition("day")
                .write.mode("overwrite")
                .partitionBy("day")
                .parquet(archive_path(base, i))
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)


def streaming_cascade(
    points: DataFrame,
    cfg: SeriesConfig,
    base: str,
    checkpoint: str,
    lateness_seconds: Optional[int] = None,
    available_now: bool = True,
):
    """Start the cascading streaming query; returns the StreamingQuery.

    ``points``: streaming (metric, ts timestamp, value, write_seq).
    Archive 0 rows append to ``base/archive=0`` (day-partitioned);
    every non-empty micro-batch consolidates its touched days down the
    remaining archive levels.
    """
    rolled = streaming_rollup(points, cfg, 0, lateness_seconds=lateness_seconds)
    spark = points.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch = batch_df.withColumn(
            "day", F.to_date(F.timestamp_seconds(F.col("interval")))
        )
        if batch.isEmpty():
            return
        (
            batch.select("metric", "interval", "value", "day")
            .repartition("day")
            .write.mode("append")
            .partitionBy("day")
            .parquet(archive_path(base, 0))
        )
        touched = [r["day"] for r in batch.select("day").distinct().collect()]
        _consolidate_touched(spark, base, cfg, touched)

    writer = rolled.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    ).outputMode("append")
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
