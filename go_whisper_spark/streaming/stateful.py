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


# ---------------------------------------------------- render window ops
# Order-sensitive render operators (movingSum/movingAverage/movingMin/
# movingMax/derivative/nonNegativeDerivative) over a stream of closed
# archive or summarize rows.  The batch forms are per-metric ROWS
# windows ordered by interval (render.py); the streaming form keeps
# the trailing window as per-metric state:
#
#   state = the last (k-1) ROWS' cents (derivatives: the last 1),
#           NULL slots kept as _NULL_SENT so the ROWS frame counts
#           them exactly like the batch window does — O(k) per metric,
#           independent of stream length.
#
# Correctness depends on per-metric interval order ACROSS micro-
# batches, which the chained in-order handoff provides (each handoff
# batch carries intervals strictly above everything released before
# it — streaming/render.py's 0-lateness argument); within a batch the
# kernel sorts by interval.  Arithmetic is the batch operator's,
# operand for operand: sum/min/max skip NULLs inside the ROWS frame,
# movingAverage floors sum/count over non-NULL slots, derivative is
# cur − prev with NULL propagation, nonNegativeDerivative NULLs
# counter drops.

RENDER_WINDOW_OPS = frozenset({
    "movingSum", "movingAverage", "movingMin", "movingMax",
    "derivative", "nonNegativeDerivative",
})

_WIN_OUTPUT_SCHEMA = "metric string, interval long, cents long"
_WIN_STATE_SCHEMA = "buf array<long>"
_NULL_SENT = -(1 << 62)  # cents are |v|*100 of double metrics — safe


def _window_fn(op: str, k: int):
    import math

    def fn(key, pdfs, state):
        (metric,) = key
        buf = list(state.get[0]) if state.exists else []
        chunks = [p for p in pdfs if len(p)]
        rows = []
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values("interval")
            for iv, c in zip(pdf["interval"], pdf["cents"]):
                cur = None if pd.isna(c) else int(c)
                if op in ("derivative", "nonNegativeDerivative"):
                    prev = buf[-1] if buf else None
                    if prev == _NULL_SENT:
                        prev = None
                    out = (None if cur is None or prev is None
                           else cur - prev)
                    if op == "nonNegativeDerivative" and out is not None \
                            and out < 0:
                        out = None
                else:
                    win = [v for v in buf[-(k - 1):] if v != _NULL_SENT] \
                        if k > 1 else []
                    if cur is not None:
                        win.append(cur)
                    if not win:
                        out = None
                    elif op == "movingSum":
                        out = sum(win)
                    elif op == "movingMin":
                        out = min(win)
                    elif op == "movingMax":
                        out = max(win)
                    else:  # movingAverage: the batch floored-cent mean
                        out = math.floor(float(sum(win)) / len(win))
                rows.append((metric, int(iv), out))
                buf.append(_NULL_SENT if cur is None else cur)
            keep = (1 if op in ("derivative", "nonNegativeDerivative")
                    else max(k - 1, 0))
            state.update((buf[-keep:] if keep else [],))
        if rows:
            yield pd.DataFrame(rows, columns=["metric", "interval", "cents"])

    return fn


def render_window_op(frame: DataFrame, op: str, k: int = 1) -> DataFrame:
    """Streaming (metric, interval, cents) frame → the same frame with
    ``op`` applied per metric (cross-batch trailing-window state)."""
    if op not in RENDER_WINDOW_OPS:
        raise ValueError(f"not a streaming render window op: {op}")
    return frame.groupBy("metric").applyInPandasWithState(
        _window_fn(op, k),
        outputStructType=_WIN_OUTPUT_SCHEMA,
        stateStructType=_WIN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------------ streaming funnel
# The k-step funnel ON the live archive stream: events fold per user
# exactly like the batch `funnel_fold` (operators/whisper_queries.py),
# but at HOUR grain over the level-0 LWW handoff — which is what makes
# online == batch: the chained handoff delivers each user's
# (event-type, hour-bucket) rows in bucket order across micro-batches
# (streaming/render.py's in-order watermark argument), so the greedy
# first-match fold sees candidates in the same order the batch
# min-filter chain selects them.  Strict > at every step makes
# same-bucket ties unorderable in BOTH formulations, so intra-batch
# tie order cannot matter.
#
# State per user = the k fired bucket timestamps (-1 = not fired):
# O(k) longs, independent of event volume — and monotone, so each
# step ADVANCEMENT is emitted exactly once: the output is an
# append-safe (user_id, step, interval) change stream.

FUNNEL_OUTPUT_SCHEMA = "user_id long, step integer, interval long"
FUNNEL_STATE_SCHEMA = "s array<long>"


def _funnel_fn(steps, window_secs: int):
    idx = {name: i for i, name in enumerate(steps)}
    k = len(steps)

    def fn(key, pdfs, state):
        (user,) = key
        s = list(state.get[0]) if state.exists else [-1] * k
        rows = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["interval", "et"])
            for et, iv in zip(pdf["et"], pdf["interval"]):
                i = idx.get(et)
                if i is None or s[i] != -1:
                    continue
                iv = int(iv)
                if i == 0:
                    s[0] = iv
                    rows.append((user, 1, iv))
                elif (s[i - 1] != -1 and iv > s[i - 1]
                        and iv <= s[0] + window_secs):
                    s[i] = iv
                    rows.append((user, i + 1, iv))
            state.update((s,))
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "step", "interval"])

    return fn


def streaming_funnel(rows: DataFrame, steps, window_secs: int) -> DataFrame:
    """Streaming (user_id, et, interval) frame → the funnel-step
    advancement change stream (user_id, step, interval)."""
    return rows.groupBy("user_id").applyInPandasWithState(
        _funnel_fn(list(steps), window_secs),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------- streaming transitions
# The Markov edge builder ON the stream: the batch form is ONE lag
# window per user (w_event_transitions); online, consecutive events
# can straddle micro-batch boundaries, so the kernel carries each
# user's LAST event (ts, seq, et) as state and prepends it to the
# next batch — with the time-chunked replay delivering each user's
# events in (ts, seq) order across batches, the emitted pair multiset
# equals the batch lag window's exactly.  Per batch the kernel emits
# per-user PARTIAL edge counts (src, dst, n): the graph sketch whose
# keyed-counter SUM is the merge law downstream PageRank runs on.

TRANSITIONS_OUTPUT_SCHEMA = "src string, dst string, n long"
TRANSITIONS_STATE_SCHEMA = "ts long, seq long, et string"


def _transitions_fn(key, pdfs, state):
    (user,) = key
    prev = state.get if state.exists else None
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values(["ts", "seq"])
    counts: dict = {}
    last = prev
    for et, ts, seq in zip(pdf["et"], pdf["ts"], pdf["seq"]):
        if last is not None:
            k = (last[2], et)
            counts[k] = counts.get(k, 0) + 1
        last = (int(ts), int(seq), et)
    state.update(last)
    if counts:
        yield pd.DataFrame(
            [(s, d, n) for (s, d), n in counts.items()],
            columns=["src", "dst", "n"],
        )


def streaming_transitions(rows: DataFrame) -> DataFrame:
    """Streaming (user_id, et, ts, seq) frame → per-batch partial
    Markov edge counts (src, dst, n) with exact cross-batch pairing."""
    return rows.groupBy("user_id").applyInPandasWithState(
        _transitions_fn,
        outputStructType=TRANSITIONS_OUTPUT_SCHEMA,
        stateStructType=TRANSITIONS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------- streaming first-seen
# Append-safe streaming DISTINCT-keys: emit each key's FIRST-seen
# payload exactly once (state = the emitted flag), without update
# mode.  With the time-chunked in-order replay the first row seen IS
# the global first, so the emitted (user, day) stream equals the
# batch min-aggregate — the first-touch cohort dimension computed
# online (st_funnel_cohort).

FIRST_SEEN_OUTPUT_SCHEMA = "user_id long, day long"
FIRST_SEEN_STATE_SCHEMA = "emitted integer"


def _first_seen_fn(key, pdfs, state):
    (user,) = key
    if state.exists:
        return
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return
    day = int(min(int(p["day"].min()) for p in chunks))
    state.update((1,))
    yield pd.DataFrame([(user, day)], columns=["user_id", "day"])


def streaming_first_seen(rows: DataFrame) -> DataFrame:
    """Streaming (user_id, day) frame → one (user_id, day) row per
    user at its first appearance (in-order feed ⇒ the batch min)."""
    return rows.groupBy("user_id").applyInPandasWithState(
        _first_seen_fn,
        outputStructType=FIRST_SEEN_OUTPUT_SCHEMA,
        stateStructType=FIRST_SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------- streaming shot bounds
# Shot-boundary hamming ON the stream: the batch form is ONE lag
# window per video over the per-frame aHash bits (m_shot_bounds);
# online, adjacent frames can straddle micro-batch boundaries, so the
# kernel carries each video's LAST frame bits as state — a few dozen
# bytes per video, exactly the per-file-header asymptotics of the
# derivative kernel.  With frames delivered in f order across batches
# (the arrive marking is monotone in f) and sorted by f within each
# batch, the emitted per-pair hamming rows equal the batch lag
# exactly, so the downstream ledger is slicing-invariant and the
# oracle is the batch SQL verbatim.  Each video's FIRST frame emits
# h NULL (no predecessor) — the row the ledger's n_frames counts and
# its max/sum skip, matching the batch window's NULL lag.

SHOT_OUTPUT_SCHEMA = "media_id long, f long, h long"
SHOT_STATE_SCHEMA = "last_b array<long>"


def _shot_hamming_fn(key, pdfs, state):
    (media_id,) = key
    last_b = list(state.get[0]) if state.exists else None
    chunks = [p for p in pdfs if len(p)]
    if not chunks:
        return
    pdf = pd.concat(chunks, ignore_index=True).sort_values("f")
    rows = []
    for f, b in zip(pdf["f"], pdf["b"]):
        b = [int(x) for x in b]
        h = (None if last_b is None
             else sum(abs(x - y) for x, y in zip(b, last_b)))
        rows.append((int(media_id), int(f), h))
        last_b = b
    state.update(([int(x) for x in last_b],))
    yield pd.DataFrame(rows, columns=["media_id", "f", "h"])


def streaming_shot_hamming(frames: DataFrame) -> DataFrame:
    """Streaming (media_id, f, b array<int>) frame → per-frame
    hamming-to-previous rows with cross-batch single-frame state."""
    return frames.groupBy("media_id").applyInPandasWithState(
        _shot_hamming_fn,
        outputStructType=SHOT_OUTPUT_SCHEMA,
        stateStructType=SHOT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
