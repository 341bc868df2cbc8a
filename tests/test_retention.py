"""Storage layout + reaper tests: day-partitioned archives, partition
pruning on fetch, and O(1) partition-drop expiry."""

import os

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.engine import WhisperEngine
from go_whisper_spark.model import SeriesConfig
from go_whisper_spark.retention import (
    MaterializedRollups,
    archive_path,
    reap,
    write_archives,
)

DAY = 86400
NOW = 1_700_000_000 - (1_700_000_000 % DAY)  # midnight-aligned
PTS_SCHEMA = "metric string, ts long, value double, write_seq long"


@pytest.fixture
def store(spark, tmp_path):
    cfg = SeriesConfig.from_defs("1h:2d,6h:10d", "sum", 0.0)
    eng = WhisperEngine(spark, cfg)
    rows = []
    for d in range(9):  # nine days of hourly points
        for h in range(0, 24, 2):
            ts = NOW - d * DAY + h * 3600
            if ts <= NOW:
                rows.append(("m", ts, 1.0, ts))
    eng.update_many(spark.createDataFrame(rows, PTS_SCHEMA), NOW)
    base = str(tmp_path / "store")
    write_archives(eng, base, NOW)
    return base, cfg


def test_layout_day_partitions(store):
    base, cfg = store
    for i in range(2):
        p = archive_path(base, i)
        days = [e for e in os.listdir(p) if e.startswith("day=")]
        assert days, f"archive {i} has no day partitions"
    # archive 0 keeps only 2d of data → at most 3 day dirs
    a0_days = [e for e in os.listdir(archive_path(base, 0)) if e.startswith("day=")]
    assert len(a0_days) <= 3


def test_store_fetch_routes_and_prunes(spark, store):
    base, cfg = store
    mr = MaterializedRollups(spark, base, cfg)
    res = mr.fetch(NOW - DAY, NOW, NOW, metrics=["m"])
    assert res.step == 3600
    vals = [r["value"] for r in res.frame.orderBy("interval").collect()]
    assert len(vals) == 24
    assert sum(v is not None for v in vals) == 12  # every-2h fill
    # partition filters reach the scan
    plan = res.frame._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    res2 = mr.fetch(NOW - 5 * DAY, NOW, NOW, metrics=["m"])
    assert res2.step == 6 * 3600  # routed to coarse archive


def test_reaper_drops_old_partitions(spark, store):
    base, cfg = store
    a0 = archive_path(base, 0)
    before = sorted(e for e in os.listdir(a0) if e.startswith("day="))
    # advance one day: archive 0 (2d retention) loses exactly its oldest day
    later = NOW + DAY
    removed = reap(base, cfg, later)
    assert removed and all("archive=0" in p for p in removed)
    after = sorted(e for e in os.listdir(a0) if e.startswith("day="))
    assert after == before[1:]
    # table still readable after the partition drop
    df = spark.read.parquet(a0)
    assert df.count() > 0
    assert set(str(r["day"]) for r in df.select("day").distinct().collect()) == {
        e[4:] for e in after
    }
    # archive 1 (10d retention) untouched at +1d
    a1_days = [e for e in os.listdir(archive_path(base, 1)) if e.startswith("day=")]
    assert a1_days


def test_bucketed_archives_join_without_exchange(spark, store, tmp_path):
    """Metric-bucketed archive tables join on metric with no shuffle."""
    from pyspark.sql import functions as F

    from go_whisper_spark.engine import WhisperEngine
    from go_whisper_spark.model import SeriesConfig
    from go_whisper_spark.plans.audit import explain_formatted
    from go_whisper_spark.retention import write_archives_bucketed

    cfg = SeriesConfig.from_defs("1h:2d,6h:10d", "sum", 0.0)
    eng = WhisperEngine(spark, cfg)
    rows = [("m%d" % (i % 4), NOW - i * 3600, 1.0, i) for i in range(48)]
    eng.update_many(spark.createDataFrame(rows, PTS_SCHEMA), NOW)
    names = write_archives_bucketed(eng, "t_buck", str(tmp_path / "buck"), NOW)
    try:
        a = spark.table(names[0]).groupBy("metric").agg(F.sum("value").alias("v0"))
        b = spark.table(names[1]).groupBy("metric").agg(F.sum("value").alias("v1"))
        joined = a.join(b, "metric")
        plan = explain_formatted(joined)
        # bucketed-by-metric: aggregates and join need no hash exchange
        assert "Exchange hashpartitioning(metric" not in plan
        assert joined.count() > 0
    finally:
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_incremental_rollup_matches_full_recompute(spark, tmp_path):
    """Incremental propagate (dynamic partition overwrite of touched
    days) must equal a full recompute over all points."""
    from pyspark.sql import functions as F

    from go_whisper_spark.engine import WhisperEngine
    from go_whisper_spark.model import SeriesConfig
    from go_whisper_spark.retention import incremental_rollup, write_archives

    cfg = SeriesConfig.from_defs("1h:3d,6h:10d", "average", 0.0)
    base = str(tmp_path / "inc")
    batch1 = [("m", NOW - 2 * DAY + h * 3600, float(h), h) for h in range(0, 24, 3)]
    batch2 = [
        ("m", NOW - 3600, 42.0, 100),            # current day
        ("m", NOW - 2 * DAY + 3600, 99.0, 101),  # late point, old day, same slot as h=1? (h=1 not in batch1 since step 3)
    ]
    df1 = spark.createDataFrame(batch1, PTS_SCHEMA)
    df2 = spark.createDataFrame(batch2, PTS_SCHEMA)

    t1 = incremental_rollup(spark, base, cfg, df1, NOW)
    t2 = incremental_rollup(spark, base, cfg, df2, NOW)
    assert t1 and t2
    # batch2 touched exactly two days
    assert all(len(days) == 2 for days in t2.values())

    # full recompute reference
    eng = WhisperEngine(spark, cfg)
    eng.update_many(df1.unionByName(df2), NOW)
    ref_base = str(tmp_path / "ref")
    write_archives(eng, ref_base, NOW)

    for i in range(2):
        got = {
            (r["metric"], r["interval"]): r["value"]
            for r in spark.read.parquet(f"{base}/archive={i}").collect()
        }
        want = {
            (r["metric"], r["interval"]): r["value"]
            for r in spark.read.parquet(f"{ref_base}/archive={i}").collect()
        }
        assert got == want, f"archive {i} mismatch"
    # the late point landed (LWW by write_seq in its slot)
    a0 = spark.read.parquet(f"{base}/archive=0")
    v = a0.where(F.col("interval") == NOW - 2 * DAY + 3600).collect()
    assert v and v[0]["value"] == 99.0
