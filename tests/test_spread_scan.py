"""The layout-gated scan spread (r20, VERDICT r19 item 3).

The r19 spread sites used a bare ``repartition(defaultParallelism)``
whose round-robin Exchange stays in the plan at ANY scale — at 100 TB
it would re-shuffle the full payload even though the scan already
arrives in thousands of splits.  ``spread_scan`` gates the Exchange on
the table's measured on-disk layout: present for few-split local
files, ABSENT when the layout can already feed >= defaultParallelism
scan tasks.
"""

import os

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_spread_scan_single_file_spreads(spark, sf_dir):
    """The real testdata tables are single-file/single-row-group, so
    the gate must KEEP the round-robin Exchange there (the r19
    measured win is preserved bit-for-bit locally)."""
    from go_whisper_spark.sources.tables import (
        load_table,
        scan_splits,
        spread_scan,
    )

    dp = spark.sparkContext.defaultParallelism
    assert scan_splits(sf_dir, "documents") < dp
    df = spread_scan(
        load_table(spark, sf_dir, "documents"), spark, sf_dir, "documents"
    )
    assert df.rdd.getNumPartitions() == dp
    assert "roundrobinpartitioning" in _plan(df).lower()


def test_spread_scan_wide_layout_has_no_exchange(spark, tmp_path_factory):
    """A table whose layout already feeds >= cores scan tasks (many
    files -> many row groups) must come back UNCHANGED — no Exchange
    node anywhere in the plan (the 100 TB shape)."""
    from go_whisper_spark.sources.tables import scan_splits, spread_scan

    dp = spark.sparkContext.defaultParallelism
    base = str(tmp_path_factory.mktemp("wide_layout"))
    # 2x cores single-row-group files
    (
        spark.range(0, 64 * dp)
        .selectExpr("id AS doc_id", "repeat('x', 8) AS text")
        .repartition(2 * dp)
        .write.mode("overwrite")
        .parquet(os.path.join(base, "documents.parquet"))
    )
    n = scan_splits(base, "documents")
    assert n >= dp, f"fixture produced only {n} row groups"
    df = spark.read.parquet(os.path.join(base, "documents.parquet"))
    out = spread_scan(df, spark, base, "documents")
    assert out is df, "wide layout must be returned unchanged"
    assert "exchange" not in _plan(out).lower()


def test_spread_scan_unknown_layout_assumes_wide(spark):
    """Non-local / unlistable paths (a warehouse table at scale) must
    NOT be re-shuffled: the gate assumes the scan arrives wide."""
    from go_whisper_spark.sources.tables import scan_splits

    assert scan_splits("/nonexistent/warehouse", "documents") >= (1 << 30)
