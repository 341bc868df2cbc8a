"""applyInPandasWithState derivative: state must survive across
micro-batches (two availableNow passes sharing a checkpoint)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.streaming.stateful import streaming_derivative

BASE = 1_700_000_000
SCHEMA = "metric string, ts long, value double, write_seq long"


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)


def _run(spark, src, out, ckpt):
    q = (
        streaming_derivative(spark.readStream.schema(SCHEMA).parquet(src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return {
        (r["metric"], r["ts"]): (r["delta"], r["dt"])
        for r in spark.read.parquet(out).collect()
    }


def test_stateful_derivative_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    _write(spark, src, [("m", BASE, 10.0, 1), ("m", BASE + 60, 25.0, 2), ("n", BASE, 5.0, 3)])
    got1 = _run(spark, src, out, ckpt)
    assert got1[("m", BASE)] == (None, None)          # first point: no predecessor
    assert got1[("m", BASE + 60)] == (15.0, 60)
    assert got1[("n", BASE)] == (None, None)

    # second micro-batch: delta computed against state from pass 1
    _write(spark, src, [("m", BASE + 180, 20.0, 4), ("n", BASE + 30, 8.0, 5)])
    got2 = _run(spark, src, out, ckpt)
    assert got2[("m", BASE + 180)] == (-5.0, 120)
    assert got2[("n", BASE + 30)] == (3.0, 30)


TR_SCHEMA = "user_id long, et string, ts long, seq long"


def test_streaming_transitions_cross_batch_pairing(spark, tmp_path):
    """The Markov edge kernel must pair events ACROSS micro-batch
    boundaries via its carried last-event state: two passes over a
    time-split feed must emit exactly the batch lag window's pair
    multiset — including the boundary transition, with nothing
    double-counted after merging partials by sum."""
    from collections import Counter

    from go_whisper_spark.streaming.stateful import streaming_transitions

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [(1, "view", BASE, 1), (1, "click", BASE + 10, 2),
              (2, "view", BASE + 5, 3)]
    batch2 = [(1, "signup", BASE + 20, 4),   # boundary pair click→signup
              (2, "view", BASE + 30, 5),     # boundary pair view→view
              (2, "error", BASE + 40, 6)]

    def run_pass(rows):
        spark.createDataFrame(rows, TR_SCHEMA).coalesce(1).write.mode(
            "append").parquet(src)
        q = (
            streaming_transitions(
                spark.readStream.schema(TR_SCHEMA).parquet(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_pass(batch1)
    run_pass(batch2)
    merged = Counter()
    for r in spark.read.parquet(out).collect():
        merged[(r["src"], r["dst"])] += r["n"]
    assert merged == Counter({
        ("view", "click"): 1,     # intra-batch, user 1
        ("click", "signup"): 1,   # ACROSS the boundary, user 1
        ("view", "view"): 1,      # ACROSS the boundary, user 2
        ("view", "error"): 1,     # intra-batch, user 2
    })


FS_SCHEMA = "user_id long, day long"


def test_streaming_first_seen_arrival_semantics(spark, tmp_path):
    """The first-seen kernel emits each user exactly once, at the
    minimum day of the user's FIRST-ARRIVING batch — a later batch
    carrying an earlier (late) day must NOT re-emit or correct (the
    arrival-first-touch contract st_funnel_cohort documents)."""
    from go_whisper_spark.streaming.stateful import streaming_first_seen

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_pass(rows):
        spark.createDataFrame(rows, FS_SCHEMA).coalesce(1).write.mode(
            "append").parquet(src)
        q = (
            streaming_first_seen(
                spark.readStream.schema(FS_SCHEMA).parquet(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_pass([(1, 30), (1, 10), (2, 40)])
    run_pass([(1, 5), (2, 50), (3, 20)])  # user 1's day-5 row is LATE
    rows = sorted(
        (r["user_id"], r["day"]) for r in spark.read.parquet(out).collect()
    )
    assert rows == [(1, 10), (2, 40), (3, 20)]


SH_SCHEMA = "media_id long, f long, b array<int>"


def test_streaming_shot_hamming_cross_batch(spark, tmp_path):
    """Shot-hamming kernel: the trailing frame state must survive the
    micro-batch boundary — a video's first frame in pass 2 pairs with
    its last frame from pass 1, never re-emitting NULL."""
    from go_whisper_spark.streaming.stateful import streaming_shot_hamming

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)

    def run_pass(rows):
        spark.createDataFrame(rows, SH_SCHEMA).coalesce(1).write.mode(
            "append").parquet(src)
        q = (
            streaming_shot_hamming(
                spark.readStream.schema(SH_SCHEMA).parquet(src))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return {(r["media_id"], r["f"]): r["h"]
                for r in spark.read.parquet(out).collect()}

    # pass 1: video 1 frames 0-1 (ham 2), video 2 frame 0
    got1 = run_pass([
        (1, 0, [0, 0, 1, 1]), (1, 1, [1, 0, 1, 0]), (2, 0, [1, 1, 1, 1]),
    ])
    assert got1[(1, 0)] is None and got1[(1, 1)] == 2
    assert got1[(2, 0)] is None
    # pass 2: frames straddle the boundary — video 1's f=2 pairs with
    # f=1 from pass-1 state, video 2's f=1 with its f=0
    got2 = run_pass([(1, 2, [1, 0, 1, 1]), (2, 1, [1, 1, 1, 1])])
    assert got2[(1, 2)] == 1
    assert got2[(2, 1)] == 0


def test_st_shot_bounds_equals_batch(spark, sf_dir):
    """Slicing invariance end-to-end: the streamed per-video ledger
    (frames replayed in 3 f-monotone passes, hamming across batch
    boundaries from kernel state) equals the batch lag-window rung
    row for row — the law that lets st_shot_bounds share
    m_shot_bounds' oracle verbatim."""
    from go_whisper_spark.operators.multimodal import m_shot_bounds
    from go_whisper_spark.operators.streaming_queries import st_shot_bounds

    batch = sorted(map(tuple, m_shot_bounds(spark, sf_dir).collect()))
    streamed = sorted(map(tuple, st_shot_bounds(spark, sf_dir).collect()))
    assert streamed == batch


def test_st_shot_bounds_frame_free_stream(spark, monkeypatch):
    """A corpus with zero qualifying videos (no doc holds >= 2 full
    frames) never materializes the replay sink, so the guard must
    return an EMPTY frame with the ledger schema instead of raising
    on the missing parquet path (ADVICE r18: the st_truss edge-free
    guard, mirrored)."""
    from go_whisper_spark.operators import multimodal
    from go_whisper_spark.operators.streaming_queries import st_shot_bounds

    empty = spark.createDataFrame([], "media_id long, text string, n int")
    monkeypatch.setattr(multimodal, "_shot_videos", lambda *_: empty)
    out = st_shot_bounds(spark, "unused")
    assert out.columns == ["media_id", "n_frames", "n_shots", "max_ham"]
    assert out.count() == 0
