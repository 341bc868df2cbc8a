"""Query-layer operators registered with the driver contract.

Each module exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (DuckDB SQL); ``__spark_entry__``
aggregates them.
"""
