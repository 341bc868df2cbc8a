"""Operator-unit + golden-model tests for the batch engine (SURVEY.md §5.2-3).

Covers: alignment mod semantics, LWW dedup, xff boundary (>= passes),
all five aggregation methods, dense gap-fill fetch, bound alignment
(+spp start-exclusive), retention bounds rejection, multi-metric
isolation, and seeded-random streams vs the pure-Python whisper model.
"""

import random

import pytest
from pyspark.sql import functions as F

from go_whisper_spark.engine import WhisperEngine
from go_whisper_spark.model import AggregationMethod, SeriesConfig
from tests.whisper_model import PyWhisper

NOW = 1_700_000_000 - (1_700_000_000 % 3600)  # aligned epoch for stable buckets
PTS_SCHEMA = "metric string, ts long, value double, write_seq long"


def make_engine(spark, defs="10s:1h,60s:6h,300s:1d", agg="average", xff=0.5):
    return WhisperEngine(spark, SeriesConfig.from_defs(defs, agg, xff))


def ingest(spark, engine, rows, now=NOW):
    df = spark.createDataFrame(rows, PTS_SCHEMA)
    return engine.update_many(df, now)


def fetch_values(engine, metric, from_t, until_t, now=NOW):
    res = engine.fetch(from_t, until_t, now, metrics=[metric])
    rows = res.frame.orderBy("interval").collect()
    return res, [r["value"] for r in rows]


# ---- bounds: future + too-old rejected (p_late) -------------------------
def test_update_bounds(spark):
    eng = make_engine(spark)
    accepted = ingest(
        spark,
        eng,
        [
            ("m", NOW + 10, 1.0, 1),              # future → reject
            ("m", NOW - 86400, 2.0, 2),           # age == maxRetention → reject
            ("m", NOW - 86400 + 1, 3.0, 3),       # just inside → accept
            ("m", NOW - 5, 4.0, 4),               # fresh → accept
        ],
    )
    assert sorted(r.value for r in accepted.collect()) == [3.0, 4.0]


# ---- LWW per interval (p_dup_interval) ----------------------------------
def test_last_writer_wins(spark):
    eng = make_engine(spark)
    ingest(
        spark,
        eng,
        [
            ("m", NOW - 15, 1.0, 1),
            ("m", NOW - 12, 2.0, 2),   # same 10s bucket as above → wins
            ("m", NOW - 11, 9.0, 1),   # lower seq, same bucket → loses
        ],
    )
    arch0 = eng.archive_frame(0, NOW).collect()
    assert len(arch0) == 1
    assert arch0[0]["value"] == 2.0
    assert arch0[0]["interval"] == NOW - 20


# ---- alignment mod semantics --------------------------------------------
def test_interval_alignment(spark):
    eng = make_engine(spark, defs="60s:1h,300s:1d")
    ingest(spark, eng, [("m", NOW - 61, 5.0, 1)])
    arch0 = eng.archive_frame(0, NOW).collect()
    assert arch0[0]["interval"] == NOW - 120  # (NOW-61) - (NOW-61) % 60


# ---- xff gate boundary: known/total == xff passes (>=) ------------------
def test_xff_boundary(spark):
    # 60s→300s: 5 slots per bucket; xff=0.4 → exactly 2 known passes.
    eng = make_engine(spark, defs="60s:1h,300s:1d", agg="sum", xff=0.4)
    base = NOW - 3000
    ingest(spark, eng, [("m", base + 0, 1.0, 1), ("m", base + 60, 2.0, 2)])
    arch1 = eng.archive_frame(1, NOW).collect()
    assert len(arch1) == 1 and arch1[0]["value"] == 3.0

    # xff just above 2/5 → bucket dropped.
    eng2 = make_engine(spark, defs="60s:1h,300s:1d", agg="sum", xff=0.4001)
    ingest(spark, eng2, [("m", base + 0, 1.0, 1), ("m", base + 60, 2.0, 2)])
    assert eng2.archive_frame(1, NOW).count() == 0


# ---- the five aggregation methods (p_dense rollup) ----------------------
@pytest.mark.parametrize(
    "agg,expected",
    [
        ("average", 2.5),
        ("sum", 10.0),
        ("last", 4.0),   # value at the latest fine interval
        ("max", 4.0),
        ("min", 1.0),
    ],
)
def test_aggregation_methods(spark, agg, expected):
    eng = make_engine(spark, defs="60s:1h,300s:1d", agg=agg, xff=0.0)
    base = NOW - 3000
    rows = [("m", base + i * 60, float(v), i) for i, v in enumerate([1, 2, 3, 4])]
    ingest(spark, eng, rows)
    arch1 = eng.archive_frame(1, NOW).collect()
    assert len(arch1) == 1
    assert arch1[0]["value"] == pytest.approx(expected)


def test_last_uses_interval_not_write_order(spark):
    # LAST = value at the max interval, even if written first.
    eng = make_engine(spark, defs="60s:1h,300s:1d", agg="last", xff=0.0)
    base = NOW - 3000
    ingest(spark, eng, [("m", base + 120, 7.0, 1), ("m", base + 0, 1.0, 2)])
    arch1 = eng.archive_frame(1, NOW).collect()
    assert arch1[0]["value"] == 7.0


# ---- fetch: dense output, gaps → NULL, +spp bounds (p_gap_fetch) --------
def test_fetch_dense_gap_fill(spark):
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    ingest(spark, eng, [("m", NOW - 180, 1.0, 1), ("m", NOW - 60, 3.0, 2)])
    res, vals = fetch_values(eng, "m", NOW - 300, NOW)
    # bounds: from' = NOW-300+60 (start-exclusive), until' = NOW+60 → 5 slots
    assert res.from_interval == NOW - 240 and res.until_interval == NOW + 60
    assert res.step == 60
    # slots: NOW-240, NOW-180, NOW-120, NOW-60, NOW
    assert vals == [None, 1.0, None, 3.0, None]


def test_fetch_unaligned_bounds(spark):
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    ingest(spark, eng, [("m", NOW - 180, 1.0, 1)])
    res, _ = fetch_values(eng, "m", NOW - 299, NOW - 1)
    # from'=(NOW-299) - (NOW-299)%60 + 60 = NOW-240-(NOW%60... NOW aligned)→NOW-240+1? no:
    # NOW is 3600-aligned so (NOW-299)%60 == 1 → from' = NOW-300+60 = NOW-240.
    assert res.from_interval == NOW - 240
    assert res.until_interval == NOW


def test_fetch_empty_archive_all_nulls(spark):
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    ingest(spark, eng, [("other_metric", NOW - 60, 1.0, 1)])
    _, vals = fetch_values(eng, "m", NOW - 300, NOW)
    assert vals == [None] * 5


def test_fetch_archive_routing(spark):
    # from-age beyond archive-0 retention → coarser archive step.
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    ingest(spark, eng, [("m", NOW - 7000, 2.0, 1), ("m", NOW - 60, 3.0, 2)])
    res, _ = fetch_values(eng, "m", NOW - 7200, NOW)     # 2h ago > 1h ret
    assert res.step == 300
    res2, _ = fetch_values(eng, "m", NOW - 3600, NOW)    # exactly 1h → finest (>=)
    assert res2.step == 60


def test_fetch_clamps_to_max_retention(spark):
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    ingest(spark, eng, [("m", NOW - 60, 3.0, 1)])
    res, _ = fetch_values(eng, "m", NOW - 10 * 86400, NOW)
    assert res.from_interval == NOW - 6 * 3600 + 300
    with pytest.raises(ValueError):
        eng.fetch(NOW, NOW - 100, NOW)


# ---- multi-metric isolation (p_multi_metric) ----------------------------
def test_multi_metric_isolation(spark):
    eng = make_engine(spark, defs="60s:1h,300s:6h", agg="sum", xff=0.0)
    rows = []
    for m in ["a", "b", "c"]:
        rows += [(m, NOW - 240 + i * 60, float(ord(m)), i) for i in range(3)]
    ingest(spark, eng, rows)
    arch1 = {r["metric"]: r["value"] for r in eng.archive_frame(1, NOW).collect()}
    assert arch1 == {"a": 3 * 97.0, "b": 3 * 98.0, "c": 3 * 99.0}


# ---- golden model: seeded random streams vs PyWhisper (p_random) --------
@pytest.mark.parametrize("agg", ["average", "sum", "last", "max", "min"])
@pytest.mark.parametrize("seed", [42, 7])
def test_random_stream_matches_python_model(spark, agg, seed):
    rng = random.Random(seed)
    cfg = SeriesConfig.from_defs("30s:30m,300s:3h,900s:12h", agg, 0.3)
    eng = WhisperEngine(spark, cfg)
    model = PyWhisper(cfg)

    rows = []
    for seq in range(300):
        metric = rng.choice(["m1", "m2"])
        ts = NOW - rng.randrange(0, 13 * 3600)   # some beyond retention
        rows.append((metric, ts, round(rng.uniform(-100, 100), 3), seq))
    ingest(spark, eng, rows)
    model.update_many(rows, NOW)

    for from_age, until_age in [(1800, 0), (3 * 3600, 600), (12 * 3600, 0)]:
        for metric in ["m1", "m2"]:
            res, got = fetch_values(eng, metric, NOW - from_age, NOW - until_age)
            f, u, step, want = model.fetch(metric, NOW - from_age, NOW - until_age, NOW)
            assert (res.from_interval, res.until_interval, res.step) == (f, u, step)
            assert len(got) == len(want)
            for g, w in zip(got, want):
                if w is None:
                    assert g is None
                else:
                    assert g == pytest.approx(w, rel=1e-9)


def test_single_update_api(spark):
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    assert eng.update("m", 5.0, NOW - 30, NOW) is True
    assert eng.update("m", 1.0, NOW + 10, NOW) is False     # future
    assert eng.update("m", 1.0, NOW - 7 * 3600, NOW) is False  # too old
    arch0 = eng.archive_frame(0, NOW).collect()
    assert len(arch0) == 1 and arch0[0]["value"] == 5.0


# ---- random archive CONFIGS (not just random streams) -------------------
@pytest.mark.parametrize("seed", [3, 11])
def test_random_config_matches_python_model(spark, seed):
    """Engine ≡ PyWhisper for randomized retention ladders too."""
    rng = random.Random(seed)
    # build a valid 2-3 level ladder: fine spp divides coarse spp,
    # coarser covers strictly more, fine holds >= one coarse bucket
    spp0 = rng.choice([10, 30, 60])
    mult1 = rng.choice([5, 6, 10])
    spp1 = spp0 * mult1
    pts0 = rng.randrange(mult1 * 2, 500)
    pts1 = pts0 // mult1 + rng.randrange(2, 50)
    defs = f"{spp0}s:{pts0},{spp1}s:{pts1}"
    agg = rng.choice(["average", "sum", "last", "max", "min"])
    xff = rng.choice([0.0, 0.25, 0.5])
    cfg = SeriesConfig.from_defs(defs, agg, xff)

    eng = WhisperEngine(spark, cfg)
    model = PyWhisper(cfg)
    rows = [
        ("m", NOW - rng.randrange(0, cfg.max_retention + spp1), round(rng.uniform(-50, 50), 3), seq)
        for seq in range(150)
    ]
    ingest(spark, eng, rows)
    model.update_many(rows, NOW)

    for from_age in [cfg.retentions[0].retention // 2, cfg.max_retention]:
        res, got = fetch_values(eng, "m", NOW - from_age, NOW)
        f, u, step, want = model.fetch("m", NOW - from_age, NOW, NOW)
        assert (res.from_interval, res.until_interval, res.step) == (f, u, step)
        for g, w in zip(got, want):
            if w is None:
                assert g is None
            else:
                assert g == pytest.approx(w, rel=1e-9)


def test_fetch_all_metrics_dense_even_when_range_empty(spark):
    """fetch(metrics=None) spans every known metric — a series with no
    points in range still yields its dense all-NULL slots (whisper's
    empty-archive all-NaN result)."""
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    ingest(spark, eng, [
        ("recent", NOW - 60, 1.0, 1),
        ("stale", NOW - 5 * 3600, 2.0, 2),   # nothing in the last 5 min
    ])
    res = eng.fetch(NOW - 300, NOW, NOW)
    rows = res.frame.collect()
    by_metric = {}
    for r in rows:
        by_metric.setdefault(r["metric"], []).append(r["value"])
    assert set(by_metric) == {"recent", "stale"}
    assert len(by_metric["stale"]) == 5
    assert all(v is None for v in by_metric["stale"])
    assert any(v is not None for v in by_metric["recent"])


def test_resize_changes_ladder_without_rewrite(spark):
    """resize(): same points, new retention ladder — finer fetch step and
    different aggregation, no re-ingest (the reference needs an external
    whisper-resize tool + full file rewrite for this)."""
    eng = make_engine(spark, defs="300s:1h,900s:6h", agg="average", xff=0.0)
    rows = [("m", NOW - i * 60, float(i), i) for i in range(10)]
    ingest(spark, eng, rows)
    res, _ = fetch_values(eng, "m", NOW - 1800, NOW)
    assert res.step == 300

    resized = eng.resize(SeriesConfig.from_defs("60s:1h,300s:6h", "sum", 0.0))
    res2, vals2 = fetch_values(resized, "m", NOW - 600, NOW)
    assert res2.step == 60
    # per-60s slots now hold individual points (LWW), not 300s averages
    assert sum(v is not None for v in vals2) == 10


def test_fetch_result_points_shim(spark):
    """TimeSeries.Points() parity: ordered (interval, value) pairs."""
    eng = make_engine(spark, defs="60s:1h,300s:6h")
    ingest(spark, eng, [("m", NOW - 120, 5.0, 1)])
    res = eng.fetch(NOW - 300, NOW, NOW, metrics=["m"])
    pts = res.points("m")
    assert len(pts) == 5
    assert pts[0][0] == res.from_interval
    assert [v for _, v in pts] == [None, None, 5.0, None, None]
    assert [t for t, _ in pts] == list(
        range(res.from_interval, res.until_interval, res.step)
    )
