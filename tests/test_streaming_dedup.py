"""Streaming exact-dedup tests (streaming/dedup.py).

File-source micro-batches through a watermarked ``dropDuplicates``;
asserts the three behaviors the ``st_dedup_1h`` oracle relies on:
(a) duplicates inside one batch collapse to a single emission,
(b) duplicates of a key emitted in an EARLIER batch are suppressed by
    cross-batch state while that state is live,
(c) rows later than the watermark are dropped entirely (never emitted,
    never re-emitted after state eviction — a re-appearing key shares
    its event time, so it is necessarily late).
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.streaming.dedup import streaming_dedup

BASE = 1_700_000_000 - (1_700_000_000 % 3600)
SCHEMA = "ts timestamp, k string"


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "ts_sec long, k string").select(
        F.timestamp_seconds("ts_sec").alias("ts"), "k"
    )
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)  # distinct mtimes → stable file-source ordering


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_dedup(stream, ["k"], lateness_seconds=600)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return sorted(
        (int(r["ts"].timestamp()), r["k"])
        for r in spark.read.parquet(out).collect()
    )


@pytest.fixture
def srcdir(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    yield src
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_streaming_dedup_in_and_cross_batch(spark, srcdir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # Pass 1: key 'a' duplicated in-batch (one emission), key 'b' once.
    _write_batch(
        spark,
        srcdir,
        [(BASE, "a"), (BASE, "a"), (BASE, "b")],
    )
    got1 = _run(spark, srcdir, out, ckpt)
    assert got1 == [(BASE, "a"), (BASE, "b")]

    # Pass 2: duplicate of 'a' (state live: watermark is still behind
    # BASE) suppressed; new key 'c' emitted.
    _write_batch(spark, srcdir, [(BASE, "a"), (BASE + 60, "c")])
    got2 = _run(spark, srcdir, out, ckpt)
    assert got2 == [(BASE, "a"), (BASE, "b"), (BASE + 60, "c")]


def test_streaming_dedup_late_rows_dropped(spark, srcdir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # Pass 1: one key + a watermark pusher far ahead (wm → pusher-600).
    _write_batch(spark, srcdir, [(BASE, "a"), (BASE + 7200, "pusher")])
    _run(spark, srcdir, out, ckpt)

    # Pass 2: 'late' sits hours behind the persisted watermark → dropped;
    # a duplicate of 'a' (also behind the watermark, state evicted) must
    # NOT re-emit; 'fresh' is above the watermark → emitted.
    _write_batch(
        spark,
        srcdir,
        [(BASE + 60, "late"), (BASE, "a"), (BASE + 7260, "fresh")],
    )
    got = _run(spark, srcdir, out, ckpt)
    assert (BASE + 60, "late") not in got
    assert got.count((BASE, "a")) == 1
    assert (BASE + 7260, "fresh") in got
