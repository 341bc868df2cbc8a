"""Watermarked streaming exact-deduplication.

The streaming half of the batch exact-dedup operators (SURVEY §2C —
``d_exact_dedup`` et al.): an ingest-time filter that emits each key
once and drops every later duplicate, with state bounded by the
watermark.  This is the shape an LLM training-data pipeline runs at
the firehose: dedup keys are content digests (here a deterministic
(metric, value-bucket, hour) surrogate), and the watermark both drops
too-late arrivals and evicts state for closed time ranges, so state is
O(keys per lateness window), not O(all keys ever).

[ref: SURVEY §2C exact-dedup row; whisper.go has no streaming surface
— the analog is Update's maxRetention rejection applied to a dedup
ingest]
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    stream: DataFrame, key_cols: list[str], lateness_seconds: int
) -> DataFrame:
    """Emit the first row per (event-time, *key_cols*); drop later
    duplicates and rows later than the watermark.

    ``stream`` must carry an event-time TimestampType column ``ts``.
    ``ts`` is part of the dedup key — that is what lets Spark evict a
    key's state once the watermark passes its event time (a
    re-appearing key would by construction be late, so eviction can
    never cause a double emission)."""
    return stream.withWatermark("ts", f"{lateness_seconds} seconds").dropDuplicates(
        ["ts", *key_cols]
    )
