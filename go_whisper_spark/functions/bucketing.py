"""Core whisper-semantics expressions, as Catalyst-friendly column factories.

Everything here is built from ``pyspark.sql.functions`` so it stays
inside whole-stage codegen — no Python UDFs in the hot path.  All time
math is integer epoch-seconds (whisper knows nothing of calendars or
timezones; ``date_trunc`` is deliberately never used).

References into the reference implementation are expectation-level
(`SURVEY.md §0` — empty mount): interval alignment
[ref: whisper.go (func (archiveInfo) Interval)], last-writer-wins slot
overwrite [ref: whisper.go (Update — WriteAt on ring slot)], the
xFilesFactor gate [ref: whisper.go (func (*Whisper) propagate)], and the
five aggregation methods [ref: whisper.go (func aggregate)].
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from go_whisper_spark.model import AggregationMethod


def align_interval(ts_seconds: "Column | str", spp: int) -> Column:
    """``interval = ts - (ts mod spp)`` — whisper write-path alignment.

    [ref: whisper.go (func (archiveInfo) Interval; mod arithmetic in Update)]
    ``ts_seconds`` must already be integer epoch seconds (LongType).
    """
    ts = F.col(ts_seconds) if isinstance(ts_seconds, str) else ts_seconds
    return (ts - (ts % F.lit(spp))).cast("long")


def fetch_bounds(from_time: int, until_time: int, spp: int) -> Tuple[int, int]:
    """Whisper fetch bound alignment: ``Interval(t) = t - t%spp + spp``.

    Returns ``(from_interval, until_interval)``; the dense result covers
    intervals ``from_interval + i*spp`` for ``i in [0, (until-from)/spp)``
    — i.e. start-exclusive relative to the raw ``from_time``.
    [ref: whisper.go (func (*Whisper) Fetch — bound alignment)]
    """
    from_interval = from_time - (from_time % spp) + spp
    until_interval = until_time - (until_time % spp) + spp
    return from_interval, until_interval


def lww_latest(
    df: DataFrame,
    key_cols: "list[str]",
    seq_col: str = "write_seq",
    value_col: str = "value",
) -> DataFrame:
    """Last-writer-wins: keep, per key, the row with the greatest ``seq_col``.

    This is the relational form of the ring-buffer slot overwrite
    [ref: whisper.go (Update — same-interval WriteAt overwrites)].

    Implemented as ``max_by`` inside a hash aggregate rather than a
    row_number window: a partial-aggregating ``groupBy`` does map-side
    combine before the shuffle, so at 100 TB the exchange carries one
    row per (metric, interval), not one per raw write.
    """
    return df.groupBy(*key_cols).agg(
        F.max_by(value_col, F.col(seq_col)).alias(value_col),
        F.max(seq_col).alias(seq_col),
    )


def agg_expr(
    method: AggregationMethod, value_col: str = "value", order_col: str = "interval"
) -> Column:
    """One of the five whisper aggregation methods as a Spark aggregate.

    [ref: whisper.go (func aggregate)] — NULLs are excluded by Spark
    aggregates, which matches whisper aggregating *known* values only.
    ``LAST`` is whisper's "most recent known value", which is
    order-dependent: we use ``max_by(value, order_col)`` where
    ``order_col`` is the *fine* archive interval, for determinism
    (``F.last`` is nondeterministic under parallel aggregation).
    """
    v = F.col(value_col)
    if method is AggregationMethod.AVERAGE:
        return F.avg(v)
    if method is AggregationMethod.SUM:
        return F.sum(v)
    if method is AggregationMethod.LAST:
        return F.max_by(v, F.when(v.isNotNull(), F.col(order_col)))
    if method is AggregationMethod.MAX:
        return F.max(v)
    if method is AggregationMethod.MIN:
        return F.min(v)
    raise ValueError(f"unknown aggregation method {method}")


def xff_gated_agg(
    method: AggregationMethod,
    xff: float,
    points_per_bucket: int,
    value_col: str = "value",
    order_col: str = "interval",
) -> Column:
    """The propagate() consolidation: aggregate iff enough slots are known.

    ``known / points_per_bucket >= xff`` keeps the bucket (``>=`` — the
    boundary case passes, pinned by test); otherwise the bucket value is
    NULL and is filtered before write, which is the batch equivalent of
    propagate() returning false and stopping the cascade.
    [ref: whisper.go (func (*Whisper) propagate — knownFactor >= xff)]
    """
    # Match whisper's exact computation shape: known/total >= xff (same FP
    # division the reference performs, so boundary cases agree bit-for-bit).
    known = F.count(F.col(value_col))
    gate = (known.cast("double") / F.lit(float(points_per_bucket))) >= F.lit(float(xff))
    return F.when(gate, agg_expr(method, value_col, order_col)).otherwise(F.lit(None))
