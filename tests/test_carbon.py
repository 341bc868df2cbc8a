"""Carbon line-protocol source: tolerant parse, engine round-trip,
streaming ingest."""

import os

from pyspark.sql import functions as F

from go_whisper_spark.sources.carbon import read_carbon, carbon_rejects, read_carbon_stream

NOW = 1_700_000_000 - (1_700_000_000 % 3600)

LINES = [
    f"servers.web1.cpu 42.5 {NOW - 120}",
    f"servers.web1.cpu 43.0 {NOW - 60}",
    f"servers.db1.mem 1024 {NOW - 60}",
    "malformed line",                      # 2 fields
    f"servers.web1.cpu notanumber {NOW}",  # bad value
    f"  servers.db1.mem  7  {NOW}  ",      # extra whitespace → ok
]


def _spool(tmp_path):
    d = str(tmp_path / "spool")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "batch1.txt"), "w") as f:
        f.write("\n".join(LINES) + "\n")
    return d


def test_read_carbon_parses_and_drops_malformed(spark, tmp_path):
    d = _spool(tmp_path)
    pts = read_carbon(spark, d)
    rows = [(r["metric"], r["ts"], r["value"]) for r in pts.collect()]
    assert len(rows) == 4
    assert ("servers.db1.mem", NOW, 7.0) in rows
    assert ("servers.web1.cpu", NOW - 120, 42.5) in rows
    bad = [r["line"] for r in carbon_rejects(spark, d).collect()]
    assert len(bad) == 2 and "malformed line" in bad


def test_carbon_to_engine(spark, tmp_path):
    from go_whisper_spark.engine import WhisperEngine
    from go_whisper_spark.model import SeriesConfig

    d = _spool(tmp_path)
    eng = WhisperEngine(spark, SeriesConfig.from_defs("60s:1h,300s:6h", "average", 0.0))
    eng.update_many(read_carbon(spark, d), NOW)
    res = eng.fetch(NOW - 300, NOW, NOW, metrics=["servers.web1.cpu"])
    vals = [r["value"] for r in res.frame.orderBy("interval").collect()]
    assert 42.5 in vals and 43.0 in vals


def test_carbon_streaming(spark, tmp_path):
    d = _spool(tmp_path)
    out = str(tmp_path / "out")
    q = (
        read_carbon_stream(spark, d)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert dict(got.dtypes)["ts"] == "timestamp"

# ---- hypothesis: line-protocol round-trip ---------------------------------

from hypothesis import given, settings, strategies as st

_metric = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", min_size=1, max_size=40
).filter(lambda s: not s.isspace())
_value = st.floats(
    allow_nan=False, allow_infinity=False, width=64,
    min_value=-1e12, max_value=1e12,
)
_ts = st.integers(min_value=0, max_value=4_000_000_000)
_garbage = st.sampled_from(
    ["", "one", "a b", "a b c d", "m nan? 12", "m 1.5 notatime", "   "]
)


@settings(max_examples=5, deadline=None)
@given(
    pts=st.lists(st.tuples(_metric, _value, _ts), min_size=1, max_size=30),
    bad=st.lists(_garbage, max_size=5),
)
def test_carbon_roundtrip_property(spark, tmp_path_factory, pts, bad):
    """Any (metric, finite value, ts) formatted with Python repr must
    round-trip bit-exactly through the tolerant parser (Spark's DOUBLE
    cast parses the shortest repr back to the identical double), and
    every malformed line must be dropped — never crash, never leak."""
    d = str(tmp_path_factory.mktemp("spool"))
    lines = [f"{m} {repr(v)} {t}" for m, v, t in pts] + list(bad)
    with open(os.path.join(d, "batch.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    got = sorted(
        (r["metric"], r["value"], r["ts"])
        for r in read_carbon(spark, d).collect()
    )
    want = sorted((m, v, t) for m, v, t in pts)
    assert got == want
