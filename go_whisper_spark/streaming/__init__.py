from go_whisper_spark.streaming.rollup import streaming_rollup  # noqa: F401
from go_whisper_spark.streaming.sessions import streaming_sessions  # noqa: F401
