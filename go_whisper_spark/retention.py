"""Materialized archive storage + retention reaper.

The reference's fixed-size ring gives it free expiry: new laps
overwrite old epochs [ref: whisper.go (ring offset math)].  Columnar
storage replaces that with:

- **layout**: one parquet table per archive, partitioned by
  ``day = date(interval)`` — so retention enforcement and time-range
  fetches are partition PRUNING, not data rewrites;
- **reaper**: drop whole partition directories older than the
  archive's retention [SURVEY.md §4 custom #5].  Dropping a partition
  is an O(1) filesystem/metastore operation per day — the 100 TB
  equivalent of the ring lap.

``MaterializedRollups`` is the archive-router face of the store: fetch
picks the coarsest sufficient archive table (materialized-view routing,
[SURVEY.md §4]) and gap-fills densely, reading only pruned partitions.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timezone
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_whisper_spark.engine import WhisperEngine, FetchResult
from go_whisper_spark.functions.bucketing import fetch_bounds
from go_whisper_spark.model import SeriesConfig


def archive_path(base: str, archive_index: int) -> str:
    return os.path.join(base, f"archive={archive_index}")


def write_archives(engine: WhisperEngine, base: str, now: int) -> List[str]:
    """Materialize every archive level as a day-partitioned parquet table."""
    paths = []
    for i in range(len(engine.config.retentions)):
        frame = engine.archive_frame(i, now).withColumn(
            "day", F.to_date(F.timestamp_seconds(F.col("interval")))
        )
        path = archive_path(base, i)
        (
            frame.repartition("day")
            .write.mode("overwrite")
            .partitionBy("day")
            .parquet(path)
        )
        paths.append(path)
    return paths


def reap(base: str, config: SeriesConfig, now: int) -> List[str]:
    """Drop day-partitions entirely older than each archive's retention.

    A day partition is reaped only when its *entire* day lies before the
    cutoff (conservative: day end < now - retention).  Returns removed
    partition dirs.  Driver-side filesystem metadata work only — never
    touches row data.
    """
    removed = []
    for i, r in enumerate(config.retentions):
        cutoff = now - r.retention
        path = archive_path(base, i)
        if not os.path.isdir(path):
            continue
        for entry in sorted(os.listdir(path)):
            if not entry.startswith("day="):
                continue
            day = datetime.strptime(entry[4:], "%Y-%m-%d").replace(tzinfo=timezone.utc)
            day_end = int(day.timestamp()) + 86400
            if day_end <= cutoff:
                shutil.rmtree(os.path.join(path, entry))
                removed.append(os.path.join(path, entry))
    return removed


def write_points(points: DataFrame, base: str, mode: str = "append") -> str:
    """Bronze points table, day-partitioned on the raw timestamp."""
    path = os.path.join(base, "points")
    (
        points.withColumn("day", F.to_date(F.timestamp_seconds(F.col("ts"))))
        .repartition("day")
        .write.mode(mode)
        .partitionBy("day")
        .parquet(path)
    )
    return path


def incremental_rollup(
    spark: SparkSession,
    base: str,
    config: SeriesConfig,
    new_points: DataFrame,
    now: int,
) -> dict:
    """Incremental archive maintenance — the batch form of whisper's
    per-write propagate cascade [ref: whisper.go (func (*Whisper)
    Update — cascade loop)]:

    1. append the new batch to the bronze points table;
    2. per archive level, find the day partitions its touched intervals
       fall in (a batch usually touches the current day, not history);
    3. recompute ONLY those days from the points table (partition
       pruning makes the read proportional to touched days) and
       dynamic-partition-overwrite them in the archive table.

    At 100 TB the work per batch is O(batch ∪ touched-days), never
    O(history).  Requires every archive's step to divide a day (true
    for all practical Graphite retentions up to "1d:..."); coarser
    steps fall back to full recompute of that level.

    Returns {archive_index: [touched day strings]}.
    """
    accepted = new_points.where(
        (F.col("ts") <= F.lit(now))
        & (F.lit(now) - F.col("ts") < F.lit(config.max_retention))
    )
    write_points(accepted, base, mode="append")
    points_path = os.path.join(base, "points")

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    touched_by_level = {}
    try:
        # Touched days per level, from the batch alone (tiny aggregate).
        batch_days = [
            r["day"]
            for r in accepted.select(
                F.to_date(F.timestamp_seconds(F.col("ts"))).alias("day")
            )
            .distinct()
            .collect()
        ]
        for i, r in enumerate(config.retentions):
            if 86400 % r.seconds_per_point != 0:
                raise ValueError(
                    f"archive {i} step {r.seconds_per_point}s does not divide a "
                    "day; use full write_archives for this config"
                )
            day_strs = sorted(str(d) for d in batch_days)
            touched_by_level[i] = day_strs
            all_points = spark.read.parquet(points_path).where(
                F.col("day").isin(batch_days)
            )
            eng = WhisperEngine(spark, config)
            eng.set_points(all_points.select("metric", "ts", "value", "write_seq"))
            frame = (
                eng.archive_frame(i, now)
                .withColumn("day", F.to_date(F.timestamp_seconds(F.col("interval"))))
                .where(F.col("day").isin(batch_days))
            )
            (
                frame.repartition("day")
                .write.mode("overwrite")
                .partitionBy("day")
                .parquet(archive_path(base, i))
            )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return touched_by_level


def write_archives_bucketed(
    engine: WhisperEngine,
    table_prefix: str,
    base: str,
    now: int,
    n_buckets: int = 8,
) -> List[str]:
    """Materialize archives as metric-bucketed, interval-sorted tables.

    Bucketing by ``metric`` co-locates every archive level of a metric
    in the same bucket file: cross-archive joins (series alignment, a
    fetch union over levels, archive-vs-archive comparisons) become
    exchange-free at any scale — the 100 TB replacement for the ring
    file's "one metric, one file" locality.  Requires ``saveAsTable``
    (bucket metadata lives in the catalog).
    """
    names = []
    spark = engine.spark
    for i in range(len(engine.config.retentions)):
        name = f"{table_prefix}_archive_{i}"
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            engine.archive_frame(i, now)
            .write.mode("overwrite")
            .bucketBy(n_buckets, "metric")
            .sortBy("interval")
            .option("path", archive_path(base, i))
            .saveAsTable(name)
        )
        names.append(name)
    return names


class MaterializedRollups:
    """Read-side facade over a written archive store: router + gap-fill.

    The fetch path never recomputes rollups — it scans the one archive
    table the from-age routes to, with day-partition pruning doing the
    ring-offset's job.
    """

    def __init__(self, spark: SparkSession, base: str, config: SeriesConfig):
        self.spark = spark
        self.base = base
        self.config = config

    def archive(self, archive_index: int) -> DataFrame:
        return self.spark.read.parquet(archive_path(self.base, archive_index))

    def fetch(
        self,
        from_time: int,
        until_time: int,
        now: int,
        metrics: Optional[List[str]] = None,
    ) -> FetchResult:
        cfg = self.config
        if from_time >= until_time:
            # same up-front rejection as WhisperEngine.fetch / whisper.go
            raise ValueError("from_time must be < until_time")
        oldest = now - cfg.max_retention
        from_time = max(from_time, oldest)
        until_time = min(until_time, now)
        idx = cfg.archive_for_fetch(now - from_time)
        step = cfg.retentions[idx].seconds_per_point
        from_iv, until_iv = fetch_bounds(from_time, until_time, step)

        # day predicate → partition pruning on the scan
        day_lo = F.to_date(F.timestamp_seconds(F.lit(from_iv)))
        day_hi = F.to_date(F.timestamp_seconds(F.lit(until_iv)))
        arch = self.archive(idx).where(
            (F.col("day") >= day_lo)
            & (F.col("day") <= day_hi)
            & (F.col("interval") >= F.lit(from_iv))
            & (F.col("interval") < F.lit(until_iv))
        )
        if metrics is not None:
            arch = arch.where(F.col("metric").isin(metrics))
            metric_dim = self.spark.createDataFrame(
                [(m,) for m in metrics], "metric string"
            )
        else:
            metric_dim = arch.select("metric").distinct()
        spine = metric_dim.select(
            "metric",
            F.explode(
                F.sequence(F.lit(from_iv), F.lit(until_iv - step), F.lit(step))
            ).alias("interval"),
        )
        dense = spine.join(
            arch.select("metric", "interval", "value"), ["metric", "interval"], "left"
        )
        return FetchResult(from_iv, until_iv, step, dense)
