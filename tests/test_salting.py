"""Salted two-phase operators must equal their unsalted forms on
skewed data (one key holding ~90% of rows)."""

import pytest
from pyspark.sql import Window, functions as F

from go_whisper_spark.functions.salting import salted_join


def _skewed_df(spark):
    hot = [("hot", i, float(i % 97)) for i in range(9000)]
    cold = [(f"k{i % 50}", i, float(i % 89)) for i in range(1000)]
    return spark.createDataFrame(hot + cold, "key string, id long, v double")


def test_salted_window_topk_equals_plain(spark):
    from go_whisper_spark.functions.salting import salted_window_topk

    df = _skewed_df(spark)
    order = [F.desc("v"), F.asc("id")]
    plain = (
        df.withColumn("rn", F.row_number().over(Window.partitionBy("key").orderBy(*order)))
        .where(F.col("rn") <= 5)
    )
    salted = salted_window_topk(df, ["key"], order, k=5, n_salts=8)
    a = {(r["key"], r["rn"], r["id"]) for r in plain.collect()}
    b = {(r["key"], r["rn"], r["id"]) for r in salted.collect()}
    assert a == b


def test_salted_join_equals_plain(spark):
    df = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("k1", "A"), ("k2", "B")], "key string, tag string"
    )
    plain = df.join(dim, "key").groupBy("key", "tag").agg(F.count("*").alias("n"))
    salted = (
        salted_join(df, dim, "key", n_salts=8)
        .groupBy("key", "tag")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_chunked_sessionize_hot_key(spark):
    """90%-hot-user sessionize: the chunked two-phase plan must equal
    the plain gaps-and-islands plan exactly (boundary sessions merged,
    numbering preserved), including sessions that span chunk
    boundaries and a session chain covering several whole chunks."""
    from go_whisper_spark.functions.salting import chunked_sessionize

    gap, chunk = 1800, 86400
    rows = []
    # hot user: bursts of activity with gaps, deliberately straddling
    # day boundaries; one run of continuous activity spanning 3 days
    # (a merge CHAIN through two boundaries).
    t = 0
    for i in range(9000):
        if i % 40 == 39:
            t += gap + 1 + (i % 7) * 600     # session break
        elif i % 13 == 0:
            t += gap                          # exactly-gap: same session
        else:
            t += 17 + (i % 5) * 101
        rows.append(("hot", t, i))
    base = 40 * 86400
    for i in range(3 * 86400 // 1200):        # 3-day continuous run
        rows.append(("hot", base + i * 1200, 100000 + i))
    for u in range(50):                       # cold users
        for i in range(20):
            rows.append((f"u{u}", u * 977 + i * (gap + 3) * (i % 2) + i * 700, 200000 + u * 100 + i))
    df = spark.createDataFrame(rows, "user_id string, ts long, event_id long")

    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    plain = (
        df.withColumn(
            "new_session",
            F.when(F.lag("ts", 1).over(w).isNull(), 1)
            .when((F.col("ts") - F.lag("ts", 1).over(w)) > gap, 1)
            .otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            (F.max("ts") - F.min("ts")).alias("duration_s"),
        )
    )
    chunked = chunked_sessionize(
        df, "user_id", "ts", gap_s=gap, chunk_s=chunk, tiebreak_cols=["event_id"]
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, chunked.collect()))
    assert a == b
    # sanity: the hot user really does cross chunk boundaries
    hot_sessions = [r for r in a if r[0] == "hot"]
    assert any(r[2] // chunk != r[3] // chunk for r in hot_sessions)
