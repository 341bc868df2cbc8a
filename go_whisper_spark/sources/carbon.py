"""Carbon plaintext-protocol source: ``<metric.path> <value> <timestamp>``.

Graphite's carbon daemon is what actually writes into whisper files in
production — its line protocol (one ``metric value epoch-seconds`` per
line, publicly documented in the Graphite feeding-carbon docs) is the
reference ecosystem's native ingest format.  This source parses it
into the engine's points schema, batch or streaming:

- tolerant parsing: malformed lines (wrong field count, non-numeric
  value/timestamp) are dropped, countable via :func:`carbon_rejects`;
- ``value`` accepts float and NaN (carbon transmits NaN for unknown —
  mapped to NULL per the engine's NaN→NULL rule);
- ``write_seq`` is the arrival order within the batch (line position
  proxy via ``monotonically_increasing_id`` — stable for a given file
  layout; a production deployment would thread a real ingest sequence
  or kafka offset through instead, which this column is shaped for).

All parsing is built-in expressions (split/cast) — whole-stage codegen,
no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

POINTS_SCHEMA = "metric string, ts long, value double, write_seq long"


def _parse(lines: DataFrame, streaming: bool = False) -> DataFrame:
    parts = F.split(F.trim(F.col("value")), r"\s+")
    # try_cast: ANSI mode (Spark 4 default) makes a plain cast THROW on
    # the malformed lines this parser exists to tolerate.
    # write_seq: batch uses line arrival order (monotonically_increasing_id
    # is not allowed on streams); streaming uses the event timestamp, so
    # LWW degrades to latest-event-time-wins within a slot — carbon's own
    # behavior for out-of-order points in one flush.
    seq = (
        F.expr("try_cast(try_cast(try_element_at(p, 3) AS DOUBLE) AS BIGINT)")
        if streaming
        else F.monotonically_increasing_id()
    )
    parsed = lines.select(
        parts.alias("p"),
    ).select(
        "p",
        seq.alias("write_seq"),
        F.expr("try_element_at(p, 1)").alias("metric"),
        F.expr("try_cast(try_cast(try_element_at(p, 3) AS DOUBLE) AS BIGINT)").alias("ts"),
        F.expr("try_cast(try_element_at(p, 2) AS DOUBLE)").alias("value"),
        F.size("p").alias("_n"),
    ).drop("p")
    ok = (
        (F.col("_n") == 3)
        & F.col("metric").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    )
    return parsed.withColumn("_ok", ok)


def read_carbon(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of carbon line-protocol files → points frame."""
    return (
        _parse(spark.read.text(path))
        .where(F.col("_ok"))
        .select("metric", "ts", "value", "write_seq")
    )


def carbon_rejects(spark: SparkSession, path: str) -> DataFrame:
    """The malformed lines (for dead-lettering / monitoring)."""
    lines = spark.read.text(path)
    parsed = _parse(lines)
    return (
        lines.withColumn("write_seq", F.monotonically_increasing_id())
        .join(parsed.where(~F.col("_ok")).select("write_seq"), "write_seq", "left_semi")
        .select(F.col("value").alias("line"))
    )


def read_carbon_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming read (file source) of a carbon spool directory —
    feed directly into ``streaming.rollup.streaming_rollup`` after
    converting ts to TimestampType."""
    stream = spark.readStream.text(path)
    return (
        _parse(stream, streaming=True)
        .where(F.col("_ok"))
        .select(
            "metric",
            F.timestamp_seconds(F.col("ts")).alias("ts"),
            "value",
            "write_seq",
        )
    )
