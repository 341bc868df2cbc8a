"""Streaming session-window tests.

File-source micro-batches (one availableNow pass per file batch so the
persisted watermark advances between passes) → session_window with
watermark; asserts (a) events within the gap merge into one session,
(b) events exactly one gap apart merge too (the inclusive boundary the
batch oracle pinned), (c) a separate burst makes a second session,
(d) events older than the watermark are dropped.
"""

import time

from pyspark.sql import functions as F

from go_whisper_spark.streaming.sessions import streaming_sessions

BASE = 1_700_000_000
SCHEMA = "user_id long, ts timestamp"


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "user_id long, ts_sec long").select(
        "user_id", F.timestamp_seconds("ts_sec").alias("ts")
    )
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)


def _run(spark, src, out, checkpoint):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_sessions(stream, gap_seconds=1800, lateness_seconds=3600)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["user_id"], r["session_start"]): (r["window_end"], r["n_events"])
        for r in spark.read.parquet(out).collect()
    }


def test_streaming_sessions(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # Session A: three events, the last exactly one gap after the
    # second (inclusive boundary).  Session B: separate burst.
    _write_batch(
        spark,
        src,
        [
            (1, BASE),
            (1, BASE + 100),
            (1, BASE + 100 + 1800),
            (1, BASE + 10_000),
            (2, BASE + 50),
        ],
    )
    got = _run(spark, src, out, ckpt)
    # Watermark after the pass = BASE+10000 - 3600: session A
    # (end BASE+3700, 3 events — the boundary event MERGED) and user
    # 2's session close; the BASE+10000 session is still open.
    assert got == {
        (1, BASE): (BASE + 1900 + 1800, 3),
        (2, BASE + 50): (BASE + 1850, 1),
    }

    # Advance event time far enough to close the open session, and
    # sneak in a too-late event (before the new watermark) that must
    # be dropped rather than reopening session A.
    _write_batch(
        spark,
        src,
        [
            (1, BASE + 40_000),
            (1, BASE + 200),  # late: watermark will be BASE+40000-3600
        ],
    )
    got = _run(spark, src, out, ckpt)
    assert got[(1, BASE)] == (BASE + 1900 + 1800, 3)  # unchanged
    assert got[(1, BASE + 10_000)] == (BASE + 11_800, 1)
    assert got[(2, BASE + 50)] == (BASE + 1850, 1)
    # the late event created no extra session for user 1 at BASE+200
    assert (1, BASE + 200) not in got
    assert len(got) == 3
