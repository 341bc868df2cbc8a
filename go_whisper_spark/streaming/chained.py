"""Fully declarative chained streaming cascade.

``streaming/cascade.py`` drives the lower archives with a
``foreachBatch`` batch-consolidation per micro-batch — the production
low-latency shape.  This module is the *declarative* alternative the
ROADMAP called out: every archive level is its own Structured
Streaming query, and levels hand off through parquet FILE SINKS read
back as FILE SOURCES — the public sink→source chaining pattern, where
the sink's ``_spark_metadata`` commit log gives the downstream reader
an exactly-once view of finalized files (no foreachBatch, no driver
orchestration of data).

Why downstream levels never see late data: append-mode emission at
level i−1 releases a window only once the watermark (max event time −
lateness) has passed its end, and the watermark is monotone across
micro-batches — so each batch of newly released windows carries event
times strictly above everything released before it.  Downstream
levels therefore run with a ZERO-lateness watermark and keep only the
currently-open coarse windows as state (O(1) per metric), which is
what makes an N-level declarative chain viable at 100 TB: each level
is an independent, restartable query with bounded state, scaled and
checkpointed on its own.

[ref: whisper.go (func (*Whisper) propagate) — the cascade semantics;
whisper has no streaming surface, this is the Spark-native mapping.]
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from go_whisper_spark.model import SeriesConfig
from go_whisper_spark.streaming.rollup import streaming_rollup

_LEVEL_SCHEMA = "metric string, interval long, value double"


def level_paths(base: str, n_levels: int) -> list[str]:
    return [os.path.join(base, f"level{i}") for i in range(n_levels)]


def chained_cascade_pass(
    spark: SparkSession,
    feed_schema,
    src: str,
    base: str,
    cfg: SeriesConfig,
    lateness_seconds: Optional[int] = None,
    await_secs: int = 600,
) -> list[str]:
    """Run ONE availableNow pass of every level, top to bottom.

    ``src`` is the raw points file-source dir (metric, ts timestamp,
    value, write_seq).  Level 0 applies the configured lateness; the
    in-order handoff argument above lets every lower level use a
    0-second watermark.  Checkpoints live beside the level dirs, so
    repeated calls resume incrementally — the replay harness calls
    this once per arrival pass.  Returns the level output dirs.
    """
    n = len(cfg.retentions)
    paths = level_paths(base, n)
    ckpts = [os.path.join(base, f"ckpt{i}") for i in range(n)]

    def run(df, i):
        q = (
            df.select("metric", "interval", "value")
            .writeStream.format("parquet")
            .option("path", paths[i])
            .option("checkpointLocation", ckpts[i])
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # RuntimeError, not assert: must survive `python -O`.
        if not q.awaitTermination(await_secs):
            raise RuntimeError(f"chained cascade level {i} timed out")

    run(
        streaming_rollup(
            spark.readStream.schema(feed_schema).parquet(src),
            cfg,
            0,
            lateness_seconds=lateness_seconds,
        ),
        0,
    )
    for i in range(1, n):
        fine, coarse = cfg.retentions[i - 1], cfg.retentions[i]
        upstream = (
            spark.readStream.schema(_LEVEL_SCHEMA)
            .parquet(paths[i - 1])
            .withColumn("ts", F.timestamp_seconds(F.col("interval")))
            .withColumn("write_seq", F.lit(0).cast("long"))
        )
        run(
            streaming_rollup(
                upstream,
                cfg,
                i,
                lateness_seconds=0,
                expected_points_per_window=(
                    coarse.seconds_per_point // fine.seconds_per_point
                ),
            ),
            i,
        )
    return paths
