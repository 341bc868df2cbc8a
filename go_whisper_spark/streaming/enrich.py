"""Stream-static enrichment join — the ingest-time lookup pattern.

The missing sibling of the five streaming modules (rollup, sessions,
cascade, stateful derivative, dedup): a firehose pipeline almost
always joins each arriving record against a slowly-changing dimension
(metric → owner/team/tier, doc source → license, embedding shard →
centroid) before any stateful work.  Structured Streaming's
stream-static inner join is exactly that shape:

- the static side's PLAN is re-executed every micro-batch; how live a
  dimension refresh is depends on the static format's metadata: a
  snapshot format (Delta/Iceberg) refreshes mid-query, while plain
  parquet caches its file listing per DataFrame, so the refresh lands
  at the next trigger run with a re-resolved path (the
  restart-per-batch operational pattern — pinned by test);
- no state store is involved and no watermark is required for an
  inner join — each batch row either matches the dimension now or is
  dropped now, nothing waits;
- the broadcast hint keeps the per-batch join a map-side hash probe:
  at 100 TB of stream the dimension is still dimension-sized, so the
  stream side never shuffles.

[ref: SURVEY §2B streaming row; whisper has no streaming surface —
the analog is carbon's metric-metadata lookup at ingest]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_enrich(stream: DataFrame, dim: DataFrame, on: list[str]) -> DataFrame:
    """Inner-join each micro-batch of ``stream`` against the static
    ``dim`` on ``on``, broadcasting the dimension."""
    return stream.join(F.broadcast(dim), on, "inner")
