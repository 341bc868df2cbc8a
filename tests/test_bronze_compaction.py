"""Manifest-tracked bronze + compaction (lakehouse round-9 extension):
append-only ingest keys, atomic remove+add consolidation, and the
concurrency matrix the commit protocol promises."""

import os

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.lakehouse import (
    CommitLog,
    ConflictError,
    _append_bronze,
    bronze_table,
    compact_bronze,
    read_bronze,
    vacuum,
)

DAY = 86400
NOW = 1_700_000_000 - (1_700_000_000 % DAY)
PTS_SCHEMA = "metric string, ts long, value double, write_seq long"


def _batch(spark, lo, n):
    return spark.createDataFrame(
        [("m", NOW - 3600 * (lo + i), float(lo + i), lo + i) for i in range(n)],
        PTS_SCHEMA,
    )


def test_compaction_preserves_data_and_swaps_keys(spark, tmp_path):
    base = str(tmp_path / "store")
    for lo in (1, 5, 9):
        _append_bronze(_batch(spark, lo, 4), base)
    log = CommitLog(bronze_table(base))
    assert len(log.state()["partitions"]) == 3
    before = sorted(r.write_seq for r in read_bronze(spark, base).collect())

    v = compact_bronze(spark, base)
    st = log.state()
    assert v == st["version"] and len(st["partitions"]) == 1
    after = sorted(r.write_seq for r in read_bronze(spark, base).collect())
    assert after == before == list(range(1, 13))
    # Idempotence guard: nothing left to compact.
    assert compact_bronze(spark, base) is None


def test_racing_append_survives_compaction(spark, tmp_path):
    """A compaction holding a pre-append snapshot must land WITHOUT
    clobbering the interleaved append (disjoint keys), and the final
    read contains both the consolidated and the fresh data."""
    base = str(tmp_path / "store")
    for lo in (1, 5):
        _append_bronze(_batch(spark, lo, 4), base)
    log = CommitLog(bronze_table(base))
    st0 = log.state()  # compaction's stale snapshot

    _append_bronze(_batch(spark, 9, 4), base)  # interleaved append

    # Re-run compact_bronze's logic against the stale snapshot.
    from go_whisper_spark.lakehouse import stage_dir
    import uuid

    dirs = sorted(set(st0["partitions"].values()))
    df = spark.read.parquet(dirs[0])
    for d in dirs[1:]:
        df = df.unionByName(spark.read.parquet(d))
    out = stage_dir(bronze_table(base))
    df.repartition("day").write.partitionBy("day").parquet(out)
    log.commit(
        st0["version"],
        {f"ingest-{uuid.uuid4().hex}": out},
        remove=sorted(st0["partitions"]),
    )

    st = log.state()
    assert len(st["partitions"]) == 2  # consolidated + the fresh append
    got = sorted(r.write_seq for r in read_bronze(spark, base).collect())
    assert got == list(range(1, 13))


def test_racing_compactions_exactly_one_wins(spark, tmp_path):
    base = str(tmp_path / "store")
    for lo in (1, 5):
        _append_bronze(_batch(spark, lo, 4), base)
    log = CommitLog(bronze_table(base))
    st0 = log.state()

    assert compact_bronze(spark, base) is not None  # winner

    # Loser: same stale snapshot, same removes → key overlap.
    from go_whisper_spark.lakehouse import stage_dir
    import uuid

    out = stage_dir(bronze_table(base))
    spark.read.parquet(sorted(st0["partitions"].values())[0]).write.partitionBy(
        "day"
    ).parquet(out)
    with pytest.raises(ConflictError):
        log.commit(
            st0["version"],
            {f"ingest-{uuid.uuid4().hex}": out},
            remove=sorted(st0["partitions"]),
        )


def test_vacuum_reclaims_compacted_bronze(spark, tmp_path):
    base = str(tmp_path / "store")
    for lo in (1, 5):
        _append_bronze(_batch(spark, lo, 4), base)
    old_dirs = sorted(CommitLog(bronze_table(base)).state()["partitions"].values())
    compact_bronze(spark, base)
    removed = vacuum(bronze_table(base), min_age_seconds=0)
    assert sorted(removed) == old_dirs
    assert not any(os.path.isdir(d) for d in old_dirs)
    # Live data untouched.
    assert read_bronze(spark, base).count() == 8
