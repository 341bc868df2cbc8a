"""Catalog create/open round-trip (whisper Create/Open header parity)."""

import pytest

from go_whisper_spark.catalog import SeriesCatalog
from go_whisper_spark.model import AggregationMethod, SeriesConfig


def test_create_open_roundtrip(spark, tmp_path):
    cat = SeriesCatalog(spark, str(tmp_path / "catalog"))
    cfg = SeriesConfig.from_defs("10s:6h,1m:7d,10m:5y", "max", 0.3)
    cat.create("servers.*.cpu", cfg)
    eng = cat.open("servers.*.cpu")
    assert eng.config == cfg
    assert eng.describe()["aggregation_method"] == "MAX"
    assert eng.describe()["max_retention"] == 600 * 262800


def test_create_exclusive(spark, tmp_path):
    cat = SeriesCatalog(spark, str(tmp_path / "catalog"))
    cfg = SeriesConfig.from_defs("1m:1d", "sum", 0.5)
    cat.create("a", cfg)
    with pytest.raises(FileExistsError):
        cat.create("a", cfg)
    cat.create("b", cfg)
    assert sorted(cat.list_series()) == ["a", "b"]


def test_open_missing(spark, tmp_path):
    cat = SeriesCatalog(spark, str(tmp_path / "catalog"))
    cat.create("x", SeriesConfig.from_defs("1m:1d", "sum", 0.5))
    with pytest.raises(FileNotFoundError):
        cat.open("nope")
