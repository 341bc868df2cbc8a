"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries are contributed by the operator modules in
``go_whisper_spark.operators`` — whisper semantics over ``events``,
relational coverage over the TPC-H-ish tables, and the
LLM-data-pipeline operators (dedup / similarity / text analysis).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the whisper read path.

    events → points (metric=event_type) → 1h/30d + 6h/90d archives,
    Average, xff=0.0 → Fetch(now-3d, now) → dense gap-filled hourly
    series per metric (FIXTURES.md §B3).
    """
    from go_whisper_spark.engine import WhisperEngine
    from go_whisper_spark.model import SeriesConfig
    from go_whisper_spark.sources.tables import events_points

    pts = events_points(spark, "/root/testdata/sf0.001")
    cfg = SeriesConfig.from_defs("1h:30d,6h:90d", "average", 0.0)
    now = pts.agg(F.max("ts")).first()[0]
    engine = WhisperEngine(spark, cfg)
    engine.update_many(pts, now)
    return engine.fetch(now - 3 * 86400, now, now).frame


def _registry():
    from go_whisper_spark.operators import whisper_queries

    modules = [whisper_queries]
    for name in ("relational", "llm_ops", "multimodal", "graphite_funcs"):
        try:
            mod = __import__(f"go_whisper_spark.operators.{name}", fromlist=[name])
            modules.append(mod)
        except ImportError:
            pass
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod in modules:
        queries.update(getattr(mod, "QUERIES", {}))
        oracles.update(getattr(mod, "ORACLES", {}))
    return queries, oracles


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    return _registry()[1]
