"""Pure-unit tests for the retention DSL / validation / config layer.

Mirrors the reference's table-driven parser tests (SURVEY.md §5.1) and
the FIXTURES.md §B1 fixture table, plus hypothesis round-trips.
"""

import pytest
from hypothesis import given, strategies as st

from go_whisper_spark.model import (
    AggregationMethod,
    InvalidRetentionError,
    Retention,
    SeriesConfig,
    parse_retention_def,
    parse_retention_defs,
    validate_retentions,
)


# ---- parser: valid forms (FIXTURES.md B1) -------------------------------
@pytest.mark.parametrize(
    "definition,expected",
    [
        ("1m:1d", Retention(60, 1440)),
        ("10s:6h", Retention(10, 2160)),
        ("60:1440", Retention(60, 1440)),          # bare-int both sides
        ("1h:30d", Retention(3600, 720)),
        ("10m:5y", Retention(600, 262800)),
        ("1s:5m", Retention(1, 300)),
        ("1w:4w", Retention(604800, 4)),
        ("15:10", Retention(15, 10)),
        ("1M:1D", Retention(60, 1440)),            # case-insensitive units
    ],
)
def test_parse_valid(definition, expected):
    assert parse_retention_def(definition) == expected


@pytest.mark.parametrize(
    "definition",
    ["", ":", "1m", "1m:1d:1w", "x:1d", "1m:y", "-1m:1d", "0:10", "1m:0", "1.5m:1d"],
)
def test_parse_invalid(definition):
    with pytest.raises(InvalidRetentionError):
        parse_retention_def(definition)


def test_parse_defs_list():
    rts = parse_retention_defs("10s:6h,1m:7d,10m:5y")
    assert [r.seconds_per_point for r in rts] == [10, 60, 600]
    assert [r.points for r in rts] == [2160, 10080, 262800]


def test_parse_defs_empty():
    with pytest.raises(InvalidRetentionError):
        parse_retention_defs(" , ,")


# ---- validation: the five rules (FIXTURES.md B1 error fixtures) ---------
@pytest.mark.parametrize(
    "defs,ok",
    [
        ("1m:1d", True),
        ("10s:6h,1m:7d,10m:5y", True),
        ("60:1440", True),
        ("1h:30d,6h:90d", True),
        ("1m:1d,1m:2d", False),    # duplicate precision
        ("10m:30d,1m:1d", False),  # unordered
        ("7s:1h,10s:1d", False),   # not a whole multiple
        ("1m:1d,10m:1h", False),   # shorter coverage
        ("1m:5,10m:1d", False),    # can't consolidate one coarse bucket
    ],
)
def test_validate_rules(defs, ok):
    rts = parse_retention_defs(defs)
    if ok:
        validate_retentions(rts)
    else:
        with pytest.raises(InvalidRetentionError):
            validate_retentions(rts)


def test_validate_empty():
    with pytest.raises(InvalidRetentionError):
        validate_retentions([])


# ---- config -------------------------------------------------------------
def test_series_config():
    cfg = SeriesConfig.from_defs("1h:30d,6h:90d", "average", 0.5)
    assert cfg.max_retention == 90 * 86400
    assert cfg.aggregation_method is AggregationMethod.AVERAGE
    assert cfg.archive_for_age(0) == 0
    assert cfg.archive_for_age(30 * 86400) == 1          # == ret0 → next archive
    assert cfg.archive_for_fetch(30 * 86400) == 0        # fetch uses >=
    assert cfg.archive_for_fetch(30 * 86400 + 1) == 1
    with pytest.raises(ValueError):
        cfg.archive_for_age(90 * 86400)


def test_bad_xff():
    with pytest.raises(InvalidRetentionError):
        SeriesConfig.from_defs("1m:1d", "sum", 1.5)


def test_agg_from_name():
    assert AggregationMethod.from_name("max") is AggregationMethod.MAX
    assert AggregationMethod.AVERAGE.value == 1 and AggregationMethod.MIN.value == 5
    with pytest.raises(ValueError):
        AggregationMethod.from_name("p99")


# ---- hypothesis: grammar round-trip & invariants ------------------------
units = st.sampled_from(list("smhdwy"))


@given(n=st.integers(1, 10_000), unit=units, points=st.integers(1, 100_000))
def test_precision_unit_roundtrip(n, unit, points):
    from go_whisper_spark.model import UNIT_MULTIPLIERS

    r = parse_retention_def(f"{n}{unit}:{points}")
    assert r.seconds_per_point == n * UNIT_MULTIPLIERS[unit]
    assert r.points == points
    assert r.retention == r.seconds_per_point * points


@given(spp=st.integers(1, 3600), dur_n=st.integers(1, 1000), unit=units)
def test_duration_unit_is_floor_division(spp, dur_n, unit):
    from go_whisper_spark.model import UNIT_MULTIPLIERS

    total = dur_n * UNIT_MULTIPLIERS[unit]
    if total // spp <= 0:
        with pytest.raises(InvalidRetentionError):
            parse_retention_def(f"{spp}:{dur_n}{unit}")
    else:
        r = parse_retention_def(f"{spp}:{dur_n}{unit}")
        assert r.points == total // spp
