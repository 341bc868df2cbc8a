"""Two CONCURRENT streaming writers ingesting into one commit-log
table — the concurrency matrix st_lakehouse_ingest's docstring names.

Writer A streams half of a synthetic point set, writer B the other
half, each through its own availableNow foreachBatch query calling
``incremental_rollup_tx`` against the SAME table base.  The halves
deliberately straddle calendar-day boundaries, so the writers race on
SHARED day partitions: the optimistic protocol must absorb that (a
losing writer recomputes from the fresher bronze and retries — no
error surfaces), and the final snapshot must equal the one-shot batch
LWW over the accepted union, regardless of commit interleaving.

This test found a real bug in round 9: plain parquet append to a
shared bronze path is NOT concurrent-safe (both jobs stage under
``_temporary/0`` and clobber each other) — fixed by per-call
``ingest=<uuid>`` bronze directories in ``lakehouse._append_bronze``."""

import os
import threading

from pyspark.sql import functions as F

from go_whisper_spark.lakehouse import (
    CommitLog,
    incremental_rollup_tx,
    read_table,
    table_path,
)
from go_whisper_spark.model import SeriesConfig

DAY = 86400
NOW = 1_700_000_000 - (1_700_000_000 % DAY)
PTS_SCHEMA = "metric string, ts long, value double, write_seq long"


def _points():
    rows = []
    seq = 0
    for d in range(4):  # 4 days inside the 5d retention
        for h in (0, 6, 12):
            rows.append(("m", NOW - d * DAY - h * 3600, float(10 * d + h), seq))
            seq += 1
            # an overwrite for the same slot — LWW must pick it
            rows.append(("m", NOW - d * DAY - h * 3600 + 60, float(100 + seq), seq))
            seq += 1
    return rows


def test_two_streaming_writers_disjoint_days(spark, tmp_path):
    cfg = SeriesConfig.from_defs("1h:5d", "average", 0.0)
    base = str(tmp_path / "lake")
    pts = spark.createDataFrame(_points(), PTS_SCHEMA)
    day_idx = ((F.lit(NOW) - F.col("ts")) / DAY).cast("long")
    halves = [pts.where(day_idx % 2 == i).localCheckpoint() for i in (0, 1)]

    errors = []

    def writer(i):
        try:
            src = str(tmp_path / f"src{i}")
            ckpt = str(tmp_path / f"ckpt{i}")
            halves[i].coalesce(1).write.mode("append").parquet(src)

            def sink(batch, _bid):
                if not batch.isEmpty():
                    incremental_rollup_tx(spark, base, cfg, batch, NOW)

            q = (
                spark.readStream.schema(PTS_SCHEMA)
                .parquet(src)
                .writeStream.foreachBatch(sink)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(240):
                raise RuntimeError(f"writer {i} timed out")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    # Final snapshot == one-shot batch LWW over the ACCEPTED union
    # (the engine's Update bounds: ts <= now, now - ts < maxRetention;
    # one overwrite row sits 60 s in the future and must be rejected).
    accepted = pts.where(
        (F.col("ts") <= NOW) & (F.lit(NOW) - F.col("ts") < cfg.max_retention)
    )
    got = sorted(
        (r.metric, r.interval, r.value)
        for r in read_table(spark, table_path(base, 0)).collect()
    )
    want = sorted(
        (r.metric, r.interval, r.value)
        for r in accepted.withColumn(
            "interval", (F.col("ts") - F.col("ts") % 3600).cast("long")
        )
        .groupBy("metric", "interval")
        .agg(F.max_by("value", "write_seq").alias("value"))
        .collect()
    )
    assert got == want and len(got) == 12

    # Both writers' commits landed (>= 2 versions, every touched
    # calendar day referenced).
    log = CommitLog(table_path(base, 0))
    assert len(log.versions()) >= 2
    n_days = accepted.select(
        F.to_date(F.timestamp_seconds("ts")).alias("d")
    ).distinct().count()
    assert len(log.state()["partitions"]) == n_days
