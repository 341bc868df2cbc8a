"""go_whisper_spark — a PySpark-native engine with the query and
data-processing capabilities of robyoung/go-whisper (a Graphite Whisper
round-robin TSDB), re-expressed Spark-first.

Layers:

- ``model``               pure-Python catalog (retention DSL, validation, agg enum)
- ``functions.bucketing`` interval alignment / LWW / xff-gated agg expressions
- ``engine``              batch engine: ingest → rollup cascade → fetch
- ``streaming``           Structured Streaming rollup (watermark = maxRetention)
- ``operators``           relational + LLM-pipeline query layer (driver contract)
- ``render``              Graphite render-target expression parser + evaluator
- ``sources``             parquet/points IO + .wsp compat reader
"""

from go_whisper_spark.model import (  # noqa: F401
    AggregationMethod,
    Retention,
    SeriesConfig,
    parse_retention_def,
    parse_retention_defs,
    validate_retentions,
)


def __getattr__(name):
    # Lazy exports for the Spark-dependent layers so `import
    # go_whisper_spark` stays cheap for pure-config use.
    if name == "WhisperEngine":
        from go_whisper_spark.engine import WhisperEngine

        return WhisperEngine
    if name == "SeriesCatalog":
        from go_whisper_spark.catalog import SeriesCatalog

        return SeriesCatalog
    if name == "get_spark":
        from go_whisper_spark.session import get_spark

        return get_spark
    # NOTE: not exported as `render` — the import system binds the
    # go_whisper_spark.render MODULE to that attribute name, which
    # would shadow a lazy function export nondeterministically.
    if name == "render_target":
        from go_whisper_spark.render import render

        return render
    if name == "parse_target":
        from go_whisper_spark.render import parse_target

        return parse_target
    raise AttributeError(name)


__version__ = "0.1.0"
