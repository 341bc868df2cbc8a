"""Series catalog: the engine's replacement for whisper's file headers.

In the reference, Create writes a 16-byte metadata header per file and
Open reads it back [ref: whisper.go (func Create, func Open)].  Here
series definitions live in one tiny parquet table:

    series STRING, retention_defs STRING, aggregation_method STRING,
    x_files_factor DOUBLE

``series`` may name a single metric or a family pattern (everything in
one points table can share a config).  The catalog is metadata-scale —
thousands of rows for millions of metrics — and is read once per job,
never per record.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import Row, SparkSession

from go_whisper_spark.engine import WhisperEngine
from go_whisper_spark.model import SeriesConfig

CATALOG_SCHEMA = (
    "series string, retention_defs string, aggregation_method string, "
    "x_files_factor double"
)


class SeriesCatalog:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def _exists(self) -> bool:
        return os.path.exists(self.path)

    def create(self, series: str, config: SeriesConfig) -> WhisperEngine:
        """Register a series definition (errors if it already exists,
        like whisper Create on an existing path) and return an engine.
        [ref: whisper.go (func Create — os.O_CREATE|os.O_EXCL)]"""
        if self._exists() and self.spark.read.parquet(self.path).where(
            f"series = '{series}'"
        ).count():
            raise FileExistsError(f"series already exists in catalog: {series}")
        row = Row(
            series=series,
            retention_defs=",".join(str(r) for r in config.retentions),
            aggregation_method=config.aggregation_method.name.lower(),
            x_files_factor=float(config.x_files_factor),
        )
        self.spark.createDataFrame([row], CATALOG_SCHEMA).write.mode("append").parquet(
            self.path
        )
        return WhisperEngine(self.spark, config)

    def open(self, series: str) -> WhisperEngine:
        """[ref: whisper.go (func Open — header unpack into *Whisper)]"""
        rows = (
            self.spark.read.parquet(self.path)
            .where(f"series = '{series}'")
            .collect()
        )
        if not rows:
            raise FileNotFoundError(f"series not in catalog: {series}")
        r = rows[0]
        cfg = SeriesConfig.from_defs(
            r["retention_defs"], r["aggregation_method"], r["x_files_factor"]
        )
        return WhisperEngine(self.spark, cfg)

    def list_series(self) -> List[str]:
        if not self._exists():
            return []
        return [
            r["series"]
            for r in self.spark.read.parquet(self.path).select("series").collect()
        ]
