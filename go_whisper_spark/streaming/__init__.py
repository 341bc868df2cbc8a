from go_whisper_spark.streaming.rollup import streaming_rollup  # noqa: F401
