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
