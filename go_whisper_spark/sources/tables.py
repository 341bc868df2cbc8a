"""Parquet sources for the driver's testdata star schema.

The reference's only source is its own ``.wsp`` binary file
[ref: whisper.go (func Open)]; here the sources are columnar tables.
One wrinkle handled centrally: ``events.parquet`` stores ``ts`` as
parquet TIMESTAMP(NANOS), which Spark 4 rejects by default
(PARQUET_TYPE_ILLEGAL).  ``spark.sql.legacy.parquet.nanosAsLong=true``
reads it as LongType nanoseconds; :func:`load_table` sets that conf and
normalizes ``events`` to carry both ``ts_ns`` (long) and ``ts``
(TimestampType, microsecond truncation) so downstream code never
re-derives it.

Scale note: these are plain ``spark.read.parquet`` scans — predicate
pushdown and column pruning apply unchanged at 100 TB; nothing here
collects or infers schemas row-wise.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing the events timestamp."""
    if name == "events":
        spark.conf.set(NANOS_CONF, "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = (
                df.withColumnRenamed("ts", "ts_ns")
                .withColumn("ts_sec", F.expr("ts_ns div 1000000000").cast("long"))
                .withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
            )
        else:  # pre-normalized copies
            df = df.withColumn(
                "ts_sec", F.unix_timestamp("ts").cast("long")
            ).withColumn("ts_ns", (F.col("ts_sec") * F.lit(1_000_000_000)).cast("long"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> Dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table as whisper points: (metric, ts, value, write_seq).

    metric = event_type, sample = value, write_seq = event_id (ingest
    order — event_id is monotone in the synthetic generator).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("metric"),
        F.col("ts_sec").alias("ts"),
        F.col("value"),
        F.col("event_id").alias("write_seq"),
    )
