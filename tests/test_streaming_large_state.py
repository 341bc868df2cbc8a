"""Large-state streaming path: RocksDB state-store provider + the
hot-key salting fence for the stream-stream interval join.

docs/SCALE.md names both fences for ``st_join_1h``-class state; this
pins them:

- the replay harness runs the SAME watermarked interval join under
  ``RocksDBStateStoreProvider`` (the provider a production cluster
  uses once join state outgrows the executor heap) and must produce
  identical pairs, including cross-batch state reads back out of
  RocksDB;
- ``streaming_interval_join_salted`` must emit exactly the same pairs
  as the unsalted join on a hot-key workload (one key carrying ~90%
  of rows), with state spread over (key, salt) composite keys.
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.streaming.join import (
    streaming_interval_join,
    streaming_interval_join_salted,
)

BASE = 1_700_000_000
SCHEMA = "ts timestamp, metric string, write_seq long"
RANGE = 600
LATENESS = 1200

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(
        rows, "ts_sec long, metric string, write_seq long"
    ).select(F.timestamp_seconds("ts_sec").alias("ts"), "metric", "write_seq")
    df.coalesce(1).write.mode("append").parquet(path)
    time.sleep(0.05)


def _run(spark, src, out, ckpt, salted=False):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    fn = streaming_interval_join_salted if salted else streaming_interval_join
    joined = fn(
        stream,
        "metric",
        F.col("write_seq") % 2 == 0,
        F.col("write_seq") % 2 == 1,
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


@pytest.fixture
def rocksdb(spark):
    """Point the session at the RocksDB provider for queries started
    inside the test; restore the default (HDFS-backed) after."""
    prev = spark.conf.get(PROVIDER_KEY, None)
    spark.conf.set(PROVIDER_KEY, ROCKSDB)
    yield
    if prev is None:
        spark.conf.unset(PROVIDER_KEY)
    else:
        spark.conf.set(PROVIDER_KEY, prev)


# The hot-key workload: metric "hot" carries most rows; lefts (even
# seq) at BASE + 60*i, rights (odd seq) interleaved in range.
def _hot_rows():
    rows = []
    seq = 0
    for i in range(12):
        rows.append((BASE + 60 * i, "hot", seq)); seq += 2  # lefts 0,2,..
    for i in range(12):
        rows.append((BASE + 60 * i + 30, "hot", 2 * i + 1))  # rights 1,3,..
    rows.append((BASE + 100, "cold", 100))
    rows.append((BASE + 130, "cold", 101))
    return rows


def test_rocksdb_provider_cross_batch_state(spark, dirs, rocksdb):
    """Same scenario as the default-provider cross-batch test: the
    left row must be read back out of RocksDB state in batch 2."""
    src, out, ckpt = dirs
    _write_batch(
        spark, src,
        [(BASE, "m", 0), (BASE + 60, "m", 1), (BASE + 2 * RANGE, "m", 3)],
    )
    got = _run(spark, src, out, ckpt)
    assert got == [("m", 0, 1, 60)]
    _write_batch(spark, src, [(BASE + 300, "m", 5)])
    got = _run(spark, src, out, ckpt)
    assert got == [("m", 0, 1, 60), ("m", 0, 5, 300)]
    # The checkpoint must actually contain RocksDB-format state
    # (zip/changelog layout), not the default HDFS provider's .delta.
    state_files = []
    for root, _, files in os.walk(os.path.join(ckpt, "state")):
        state_files.extend(files)
    assert any(f.endswith((".zip", ".changelog")) for f in state_files), (
        f"no RocksDB state artifacts under checkpoint: {state_files[:10]}"
    )


def test_salted_join_matches_unsalted_on_hot_key(spark, dirs):
    src, out, ckpt = dirs
    _write_batch(spark, src, _hot_rows())
    plain = _run(spark, src, out, ckpt)
    assert len(plain) > 20  # the hot key really fans out
    got = _run(spark, src, out + "_s", ckpt + "_s", salted=True)
    assert got == plain


def test_salted_join_under_rocksdb(spark, dirs, rocksdb):
    """The composed fence: salted state distribution on the RocksDB
    provider — the actual large-cluster configuration."""
    src, out, ckpt = dirs
    _write_batch(spark, src, _hot_rows())
    plain_expected = _run(spark, src, out, ckpt)
    got = _run(spark, src, out + "_s", ckpt + "_s", salted=True)
    assert got == plain_expected
