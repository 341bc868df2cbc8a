"""Skew mitigation: salted two-phase operators.

AQE's skew-join splitting handles storage-partition skew at runtime,
and partial hash aggregation already map-side-combines hot groups.
What neither fixes:

- **window top-k over a hot partition** — ``row_number() OVER
  (PARTITION BY hot_key ...)`` funnels the entire hot key through one
  task.  ``salted_window_topk`` ranks within (key, salt) first
  (parallel), keeps k per salt, then ranks the ≤ k·n_salts survivors —
  correct because the global top-k of a partition is contained in the
  union of its per-salt top-ks.
- **shuffle joins against a hot key** — ``salted_join`` explodes the
  small side n_salts× and salts the big side's key with a deterministic
  spread (hash of the row's other columns mod n), so the hot key's rows
  land on n partitions instead of one.

Whisper context: a "hot metric" (one series receiving a large share of
writes) is the classic case — LWW and rollups are aggregates (already
fine); top-k-per-metric dashboards and metric-dimension joins are where
these helpers apply.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_window_topk(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    n_salts: int = 16,
) -> DataFrame:
    """Top-k rows per partition, skew-proof.

    ``order_cols`` must be a deterministic total order (include a unique
    tiebreak); the salt is a deterministic hash of the whole row so
    re-runs are stable.
    """
    from pyspark.sql import Window

    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )
    w1 = Window.partitionBy(*partition_cols, "_salt").orderBy(*order_cols)
    stage1 = (
        salted.withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") <= k)
        .drop("_rn1", "_salt")
    )
    w2 = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        stage1.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side against a small side, spreading each
    key across ``n_salts`` shuffle partitions.

    The small side is exploded n_salts× (acceptable because it is
    small); the big side gets a deterministic per-row salt.  Result
    equals ``big.join(small, key, how)`` for inner/left joins.
    """
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    salted_big = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)),
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def chunked_sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_s: int,
    chunk_s: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization that survives a hot user.

    The plain gaps-and-islands plan (``PARTITION BY user ORDER BY ts``)
    funnels every event of a hot user through ONE task — the window
    analog of the skewed-join problem.  This form splits the work:

    1. sessionize within ``(user, time-chunk)`` — parallel across
       chunks, so a hot user's events spread over ``span/chunk_s``
       tasks instead of one;
    2. merge chunk-boundary sessions with a second gaps-and-islands
       over the per-user SESSION relation — still partitioned by user,
       but its row count is #sessions + #chunks, orders of magnitude
       below #events, so the hot key no longer matters.

    Correct because a session crossing a chunk boundary implies two
    consecutive events within ``gap_s`` across it, so the split pieces
    satisfy ``next.start - prev.end <= gap_s`` and re-merge; and two
    pieces that merge were one session in the plain form (pieces are
    time-disjoint, so nothing lies between ``prev.end`` and
    ``next.start``).  Chains spanning many chunks merge via the running
    sum.  Requires ``chunk_s >= gap_s``.

    Returns one row per session: ``(user, session_seq, session_start,
    session_end, n_events, duration_s)`` — identical to the plain plan.
    """
    from pyspark.sql import Window

    if chunk_s < gap_s:
        raise ValueError("chunk must be at least the gap")
    ts, u = F.col(ts_col), F.col(user_col)
    chunked = df.withColumn("_chunk", (ts - ts % F.lit(chunk_s)).cast("long"))
    w1 = Window.partitionBy(user_col, "_chunk").orderBy(
        ts_col, *[F.col(c) for c in tiebreak_cols]
    )
    pieces = (
        chunked.withColumn(
            "_new",
            F.when(F.lag(ts_col, 1).over(w1).isNull(), 1)
            .when(ts - F.lag(ts_col, 1).over(w1) > F.lit(gap_s), 1)
            .otherwise(0),
        )
        .withColumn(
            "_seq", F.sum("_new").over(w1.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy(user_col, "_chunk", "_seq")
        .agg(
            F.min(ts_col).alias("_start"),
            F.max(ts_col).alias("_end"),
            F.count("*").alias("_n"),
        )
    )
    w2 = Window.partitionBy(user_col).orderBy("_start", "_end")
    return (
        pieces.withColumn(
            "_merge_new",
            F.when(F.lag("_end", 1).over(w2).isNull(), 1)
            .when(F.col("_start") - F.lag("_end", 1).over(w2) > F.lit(gap_s), 1)
            .otherwise(0),
        )
        .withColumn(
            "session_seq",
            F.sum("_merge_new").over(w2.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy(user_col, "session_seq")
        .agg(
            F.min("_start").alias("session_start"),
            F.max("_end").alias("session_end"),
            F.sum("_n").alias("n_events"),
            (F.max("_end") - F.min("_start")).alias("duration_s"),
        )
    )
