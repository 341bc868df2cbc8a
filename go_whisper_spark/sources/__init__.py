from go_whisper_spark.sources.tables import TABLE_NAMES, load_table, load_tables, events_points  # noqa: F401
