"""Streaming sessionization: native ``session_window`` + watermark.

The batch contract pins the operator's semantics twice over the same
data (``w_sessionize_30m``'s gaps-and-islands form and
``w_session_window_native``'s built-in form, both DuckDB-checked,
including the inclusive merge boundary: events exactly one gap apart
share a session).  This module is the streaming deployment of the same
operator: sessions close and emit only once the watermark passes their
end, and events later than the lateness bound are dropped — the same
state-eviction discipline as the streaming rollup's maxRetention
analog.

Scale: state is keyed by (user_id, session); Spark merges adjacent
session state on the fly, and the watermark bounds open-session state
per user to the lateness horizon.  Shuffle key = user_id, identical to
the batch plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    lateness_seconds: int = 3600,
) -> DataFrame:
    """Session-window aggregation of a streaming (user_id, ts, ...) frame.

    Returns one row per closed session: ``user_id, session_start,
    window_end (last event + gap), n_events`` — the same columns the
    batch ``w_session_window_native`` query emits, so the two paths
    are directly comparable.
    """
    return (
        events.withWatermark("ts", f"{lateness_seconds} seconds")
        .groupBy("user_id", F.session_window("ts", f"{gap_seconds} seconds"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias("session_start"),
            F.unix_timestamp(F.col("session_window.end")).alias("window_end"),
            "n_events",
        )
    )
