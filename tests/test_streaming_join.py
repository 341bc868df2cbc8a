"""Stream-stream interval-join tests (streaming/join.py).

File-source micro-batches through a watermarked self inner join with a
time-range condition; asserts the behaviors the ``st_join_1h`` oracle
relies on:
(a) pairs whose two rows arrive in the SAME batch emit immediately;
(b) a left row buffered in state pairs with a right row arriving in a
    LATER batch (cross-batch state);
(c) a right row arriving below the watermark is dropped — no pair,
    even though its left partner is on time;
(d) a left row is evicted once the watermark clears ``l_ts + range`` —
    a matching right row arriving after eviction yields no pair (the
    right row itself is late by then, which is exactly why eviction at
    that boundary is safe).
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.streaming.join import streaming_interval_join

BASE = 1_700_000_000
SCHEMA = "ts timestamp, metric string, write_seq long"
RANGE = 600
LATENESS = 1200


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "ts_sec long, metric string, write_seq long"
    ).select(F.timestamp_seconds("ts_sec").alias("ts"), "metric", "write_seq")
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)  # distinct mtimes → stable file-source ordering


def _run(spark, src, out, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    joined = streaming_interval_join(
        stream,
        "metric",
        F.col("write_seq") % 2 == 0,  # even seq = left
        F.col("write_seq") % 2 == 1,  # odd seq = right
        range_seconds=RANGE,
        lateness_seconds=LATENESS,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        raise RuntimeError("streaming pass timed out")
    return sorted(
        (r["metric"], r["l_seq"], r["r_seq"], r["lag_s"])
        for r in spark.read.parquet(out).collect()
    )


@pytest.fixture
def dirs(tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    yield src, str(tmp_path / "out"), str(tmp_path / "ckpt")
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_same_batch_and_cross_batch_pairs(spark, dirs):
    src, out, ckpt = dirs
    # Batch 1: left seq=0 at t0, right seq=1 at t0+60 (same batch,
    # in range) and right seq=3 at t0+2*RANGE (out of range).
    _write_batch(
        spark,
        src,
        [(BASE, "m", 0), (BASE + 60, "m", 1), (BASE + 2 * RANGE, "m", 3)],
    )
    got = _run(spark, src, out, ckpt)
    assert got == [("m", 0, 1, 60)]
    # Batch 2: right seq=5 at t0+300 — the left row from batch 1 is
    # still in state (watermark = BASE+2*RANGE-LATENESS = BASE, and
    # eviction needs watermark > l_ts + RANGE), so the pair emits.
    _write_batch(spark, src, [(BASE + 300, "m", 5)])
    got = _run(spark, src, out, ckpt)
    assert got == [("m", 0, 1, 60), ("m", 0, 5, 300)]


def test_late_right_row_dropped(spark, dirs):
    src, out, ckpt = dirs
    # Batch 1: left at t0; an advancer row far ahead pushes the
    # watermark to t0 + 3600 - LATENESS = t0 + 2400 after the batch.
    _write_batch(spark, src, [(BASE, "m", 0), (BASE + 3600, "n", 7)])
    assert _run(spark, src, out, ckpt) == []
    # Batch 2: right at t0+60 — in range of the left row, but 2340 s
    # below the watermark → dropped as late input; no pair.  (The left
    # row is evicted by the same watermark — both conventions agree.)
    _write_batch(spark, src, [(BASE + 60, "m", 1)])
    assert _run(spark, src, out, ckpt) == []


def test_on_time_pair_survives_watermark_advance(spark, dirs):
    src, out, ckpt = dirs
    # Batch 1: left at t0 plus an advancer that sets the watermark to
    # exactly t0 - 300 (= BASE + RANGE + 300 - LATENESS) — below the
    # eviction bound t0 + RANGE, so the left row stays in state.
    _write_batch(spark, src, [(BASE, "m", 0), (BASE + RANGE + 300, "n", 7)])
    assert _run(spark, src, out, ckpt) == []
    # Batch 2: right at t0+500 — above the watermark (on time), in
    # range → pair emits.
    _write_batch(spark, src, [(BASE + 500, "m", 1)])
    assert _run(spark, src, out, ckpt) == [("m", 0, 1, 500)]


def _run_outer(spark, src, out, ckpt, left_mod=2, right_mod=2, right_rem=1):
    from go_whisper_spark.streaming.join import streaming_interval_join_outer

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    joined = streaming_interval_join_outer(
        stream,
        "metric",
        F.col("write_seq") % left_mod == 0,
        F.col("write_seq") % right_mod == right_rem,
        range_seconds=RANGE,
        lateness_seconds=LATENESS,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(180):
        raise RuntimeError("streaming pass timed out")
    return sorted(
        (r["metric"], r["l_seq"], r["r_seq"], r["lag_s"])
        for r in spark.read.parquet(out).collect()
    )


def test_outer_unmatched_left_emits_null_after_eviction(spark, dirs):
    """The null row is eviction-paced: nothing while the join window
    is open, the null-extended row once the watermark clears
    l_ts + range (and the engine runs its finalize batch)."""
    src, out, ckpt = dirs
    _write_batch(spark, src, [(BASE, "m", 0)])  # left, no partner
    assert _run_outer(spark, src, out, ckpt) == []
    # A LEFT-pred row far ahead advances the watermark past the bound.
    _write_batch(spark, src, [(BASE + 10_000, "zz", 4)])
    got = _run_outer(spark, src, out, ckpt)
    # seq 0 null-emits; the advancing row's own window is still open.
    assert got == [("m", 0, None, None)]


def test_outer_matched_left_emits_pair_only(spark, dirs):
    src, out, ckpt = dirs
    _write_batch(spark, src, [(BASE, "m", 0), (BASE + 60, "m", 1)])
    assert _run_outer(spark, src, out, ckpt) == [("m", 0, 1.0, 60.0)]
    _write_batch(spark, src, [(BASE + 10_000, "zz", 4)])
    # Matched left must NOT additionally null-emit on eviction.
    assert _run_outer(spark, src, out, ckpt) == [("m", 0, 1.0, 60.0)]


def test_outer_watermark_ignores_filtered_rows(spark, dirs):
    """The trap st_join_1h_outer's sentinels are built around:
    Catalyst pushes the join-side predicates BELOW the
    EventTimeWatermark node, so a row matching NEITHER predicate is
    filtered before the watermark operator observes its event time —
    the watermark does not move and no eviction output appears.  A
    row that matches a predicate does move it."""
    src, out, ckpt = dirs
    _write_batch(spark, src, [(BASE, "m", 0)])  # left (0 % 4 == 0)
    assert _run_outer(spark, src, out, ckpt, left_mod=4, right_mod=4) == []
    # seq 2: matches neither %4==0 nor %4==1 → invisible to the
    # watermark; seq 0's null must NOT emit.
    _write_batch(spark, src, [(BASE + 10_000, "zz", 2)])
    assert _run_outer(spark, src, out, ckpt, left_mod=4, right_mod=4) == []
    # seq 4: a left-pred row at the same horizon → watermark moves,
    # seq 0 null-emits.
    _write_batch(spark, src, [(BASE + 10_060, "zz", 4)])
    got = _run_outer(spark, src, out, ckpt, left_mod=4, right_mod=4)
    assert got == [("m", 0, None, None)]
