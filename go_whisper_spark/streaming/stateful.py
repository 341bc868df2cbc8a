"""Custom stateful streaming operator: per-metric derivative.

Graphite's ``derivative()``/``perSecond()`` over a live stream needs the
*previous* point of each metric across micro-batches — exactly the
custom-state case ``applyInPandasWithState`` exists for (the batch form
is a ``lag`` window, ``operators/graphite_funcs.py``).

State per metric = (last_ts, last_value), a few bytes; the operator is
keyed by ``metric`` so state and input co-partition — at 100 TB the
state store scales with metric cardinality, not point volume (same
asymptotics as whisper's per-file header).

Semantics notes (documented deltas from the batch operator):
- points are ordered within each micro-batch; cross-batch ordering is
  trigger order, so an out-of-order point *across* batches produces a
  negative-time delta rather than being re-sorted — pair with a
  watermark upstream to bound disorder;
- the first point of a metric emits delta NULL (no predecessor), as
  Graphite does.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "metric string, ts long, value double, delta double, dt long"
STATE_SCHEMA = "last_ts long, last_value double"


def _derivative_fn(
    key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (metric,) = key
    if state.exists:
        last_ts, last_value = state.get
    else:
        last_ts, last_value = None, None
    # Concat BEFORE sorting: Arrow may deliver one group as several
    # chunks in shuffle order, and sorting each chunk separately would
    # break the global (ts, write_seq) order the delta depends on.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out_rows = []
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "write_seq"])
        for ts, value in zip(pdf["ts"], pdf["value"]):
            ts = int(ts)
            value = float(value)
            if last_ts is None:
                delta, dt = None, None
            else:
                delta, dt = value - last_value, ts - last_ts
            out_rows.append((metric, ts, value, delta, dt))
            last_ts, last_value = ts, value
    if last_ts is not None:
        state.update((last_ts, last_value))
    yield pd.DataFrame(
        out_rows, columns=["metric", "ts", "value", "delta", "dt"]
    )


def streaming_derivative(points: DataFrame) -> DataFrame:
    """points: streaming frame (metric string, ts long, value double,
    write_seq long) → per-point derivative with cross-batch state."""
    return points.groupBy("metric").applyInPandasWithState(
        _derivative_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
