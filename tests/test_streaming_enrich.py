"""Stream-static enrichment tests (streaming/enrich.py).

Asserts the behaviors the ``st_enrich`` oracle relies on: (a) every
batch row joins against the CURRENT static dimension and emits exactly
once, (b) unmatched rows drop (inner join), (c) a dimension refresh
between triggers is picked up without restarting the query — the
static side is re-resolved per micro-batch.
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.streaming.enrich import streaming_enrich

SCHEMA = "k string, v long"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)


def _run(spark, src, out, ckpt, dim):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_enrich(stream, dim, ["k"])
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        (r["k"], r["v"], r["family"]) for r in spark.read.parquet(out).collect()
    )


@pytest.fixture
def dirs(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    yield src, str(tmp_path / "out"), str(tmp_path / "ckpt"), tmp_path
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_enrich_joins_and_drops_unmatched(spark, dirs):
    src, out, ckpt, _ = dirs
    dim = spark.createDataFrame([("a", "x"), ("b", "y")], "k string, family string")
    _write_batch(spark, src, [("a", 1), ("b", 2), ("orphan", 3)])
    got = _run(spark, src, out, ckpt, dim)
    assert got == [("a", 1, "x"), ("b", 2, "y")]  # orphan dropped, no dupes


def test_enrich_sees_refreshed_dimension(spark, dirs):
    """A dimension refresh is picked up by the next trigger RUN on the
    same checkpoint (each availableNow run is a new query instance —
    the restart-per-batch operational pattern).  Plain parquet caches
    its file listing inside one DataFrame, so the refresh requires
    re-resolving the path; snapshot formats (Delta/Iceberg) would
    refresh even mid-query.  The stream's exactly-once bookkeeping is
    untouched: earlier emissions stay, new rows join the new map."""
    src, out, ckpt, tmp = dirs
    dim_path = str(tmp / "dim")
    spark.createDataFrame([("a", "old")], "k string, family string").write.mode(
        "overwrite"
    ).parquet(dim_path)

    _write_batch(spark, src, [("a", 1)])
    got1 = _run(spark, src, out, ckpt, spark.read.parquet(dim_path))
    assert got1 == [("a", 1, "old")]

    # refresh the dimension, then run the next trigger on the SAME
    # checkpoint with the re-resolved path: only new rows see it.
    spark.createDataFrame([("a", "new")], "k string, family string").write.mode(
        "overwrite"
    ).parquet(dim_path)
    _write_batch(spark, src, [("a", 2)])
    got2 = _run(spark, src, out, ckpt, spark.read.parquet(dim_path))
    assert ("a", 2, "new") in got2
    assert ("a", 1, "old") in got2  # earlier emission untouched
