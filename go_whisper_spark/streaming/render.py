"""Streaming evaluation of render-target expressions.

The batch render layer (``go_whisper_spark/render.py``) composes a
parsed Graphite target into one lazy DataFrame plan.  This module
proves the SAME AST drives a Structured Streaming plan: a render
target is evaluated over the live 1h LWW archive stream using the
declarative chained handoff from ``streaming/chained.py`` —

  raw points ──(streaming_rollup, 1h LWW, watermark)──▶ level0 files
  level0 stream ──(AST value maps, stateless)──▶
                ──(AST summarize → tumbling window agg, 0-lateness
                   watermark: in-order handoff)──▶ rendered files

**Streamable subset** (enforced — anything else raises
``RenderParseError``): the grammar ``stateless* windowop?
stateless* (summarize (stateless* (seed)))?`` — seeds and every
stateless per-row operator
(scale, offset, absolute, transformNull, invert, removeAbove/BelowValue,
grep, exclude, alias, aliasSub) compose freely BELOW and ABOVE at
most ONE aggregate level — ``summarize(s, h, how)``, ``groupByNode``
or ``hitcount`` — which maps onto a watermarked
tumbling window aggregate (stateless ops above it are projections
over the emitted closed-window rows — append-safe) — Graphite
consolidation as a streaming window, the same mapping
``streaming_rollup`` uses for whisper's propagate.

At most ONE order-sensitive window op (movingSum / movingAverage /
movingMin / movingMax / derivative / nonNegativeDerivative) may sit
ABOVE the aggregate level: it runs as the ``applyInPandasWithState``
kernel from ``streaming/stateful.py`` (state = the trailing k−1 ROWS
per metric, O(k) — independent of stream length).  A streaming query
cannot chain two stateful operators, so a target containing both a
summarize and a window op splits into a THIRD chained query: the
aggregate's closed windows hand off through a parquet sink/source
(cents carried as exact longs) and the kernel consumes them in
order — the same in-order watermark argument as the summarize
handoff, extended one level.  Window ops below the aggregate are
rejected (they would need yet another handoff BELOW it — register
the batch form instead).

Why the summarize level can run with a ZERO-lateness watermark: the
level-0 query releases a 1h window only once its watermark passed the
window end, and the watermark is monotone across micro-batches — each
handoff batch carries intervals strictly above everything released
before it (the ``streaming/chained.py`` in-order argument).  State at
the summarize level is the currently-open coarse buckets only: O(1)
per metric, which is what keeps a composed render target viable on an
unbounded stream.

[ref: SURVEY §2B streaming row + §2C render language; the reference
render API is batch-only — this is the Spark-native streaming
extension of the same public target syntax.]
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_whisper_spark.model import SeriesConfig
from go_whisper_spark.render import (
    Call,
    Glob,
    Node,
    Num,
    RenderParseError,
    Str,
    glob_to_regex,
    parse_target,
    validate_target,
)
from go_whisper_spark.streaming.rollup import streaming_rollup

_LEVEL_SCHEMA = "metric string, interval long, value double"

# Stateless per-row operators — the streamable value-map/label subset.
_STATELESS = frozenset({
    "scale", "offset", "absolute", "transformNull", "invert",
    "pow", "squareRoot", "removeAboveValue", "removeBelowValue",
    "grep", "exclude", "alias", "aliasSub", "aliasByNode",
    "isNonNull", "scaleToSeconds", "substr", "roundTo",
})


def check_streamable(node: Node):
    """Reject AST shapes the append-mode plan cannot express.  The
    streamable grammar is ``stateless* windowop? stateless*
    (summarize (stateless* (seed)))?`` — stateless value maps are
    append-trivial BOTH below and above the windowed aggregate (a
    projection over the emitted closed-window rows); at most ONE
    summarize, since each watermarked aggregate level needs its own
    handoff; at most ONE order-sensitive window op, ABOVE the
    aggregate, since it is a second stateful operator and therefore a
    third chained query.  Returns ``(window_node, summarize_node)``,
    either None when absent."""
    from go_whisper_spark.streaming.stateful import RENDER_WINDOW_OPS

    def walk(n: Node, allow_win: bool, allow_agg: bool):
        if isinstance(n, (Glob, Str)):
            return (None, None)
        if not isinstance(n, Call):
            raise RenderParseError(f"series expression expected, got {n}")
        if n.name == "seriesByGlob":
            return (None, None)
        if n.name == "seriesByTag":
            # tagged-universe seed: tag predicates are per-row filters
            # on the parsed path — stateless, stream-trivial (the feed
            # must carry tagged metrics; round 12).
            from go_whisper_spark.render import _parse_tag_filter

            for a in n.args:
                if isinstance(a, Str):
                    _parse_tag_filter(a.value)
            return (None, None)
        if n.name in RENDER_WINDOW_OPS and allow_win:
            if n.name in ("derivative", "nonNegativeDerivative"):
                if len(n.args) != 1:
                    raise RenderParseError(
                        f"streaming {n.name} takes (series) — the "
                        "maxValue counter-wrap form is batch-only"
                    )
            elif len(n.args) != 2 or not isinstance(n.args[1], Num) \
                    or n.args[1].value < 1:
                raise RenderParseError(f"{n.name} takes (series, k >= 1)")
            _, agg = walk(n.args[0], False, allow_agg)
            return (n, agg)
        if n.name in ("summarize", "groupByNode", "groupByTags",
                      "hitcount") and allow_agg:
            if n.name == "groupByTags":
                # validated here so rejection happens at the gate,
                # before any query is built
                if (len(n.args) != 3 or not isinstance(n.args[1], Str)
                        or not isinstance(n.args[2], Str)):
                    raise RenderParseError(
                        "groupByTags takes (series, 'method', 'tag')")
                if n.args[1].value not in ("sum", "max", "min", "avg"):
                    raise RenderParseError(
                        f"groupByTags: unknown or order-ambiguous "
                        f"method {n.args[1].value!r}")
            walk(n.args[0], False, False)
            return (None, n)
        if n.name == "group":
            # bag union of stateless branches is itself stateless —
            # streams union freely; no aggregate may hide inside.
            for a in n.args:
                walk(a, False, False)
            return (None, None)
        if n.name not in _STATELESS:
            raise RenderParseError(
                f"{n.name} is not streamable — only stateless value maps, "
                "group() unions of them, one window op above the "
                "aggregate, and one summarize/groupByNode/hitcount run "
                "on the archive stream"
            )
        return walk(n.args[0], allow_win, allow_agg)

    return walk(node, True, True)


def _apply_stateless(
    frame: DataFrame, node: Node, stop: Node = None,
    stop_frame: DataFrame = None,
) -> DataFrame:
    """Evaluate the stateless chain over a (metric, interval, cents)
    frame — the same arithmetic as the batch visitor, expression for
    expression (integer cents; see render.py's exactness contract).
    When ``stop`` is given, that AST node evaluates to ``stop_frame``
    (the already-aggregated summarize result) so the OUTER stateless
    chain composes over it."""

    def seed(pattern: str) -> DataFrame:
        return frame.where(F.col("metric").rlike(glob_to_regex(pattern)))

    def tag_col(key: str):
        # the batch layer's tag parse, verbatim (render.py tag_col)
        if key == "name":
            return F.substring_index("metric", ";", 1)
        return F.regexp_extract("metric", f";{key}=([^;]+)", 1)

    def ev(n: Node) -> DataFrame:
        if n is stop:
            return stop_frame
        if isinstance(n, (Glob, Str)):
            return seed(n.pattern if isinstance(n, Glob) else n.value)
        name = n.name
        if name == "seriesByGlob":
            return seed(n.args[0].value)
        if name == "seriesByTag":
            from go_whisper_spark.render import _parse_tag_filter

            out = frame
            for a in n.args:
                key, op, val = _parse_tag_filter(a.value)
                c = tag_col(key)
                if op == "=":
                    out = out.where(c == val)
                elif op == "!=":
                    out = out.where(c != val)
                elif op == "=~":
                    out = out.where(c.rlike(val))
                else:  # '!=~'
                    out = out.where(~c.rlike(val))
            return out
        if name == "group":
            out = ev(n.args[0])
            for a in n.args[1:]:
                out = out.unionByName(ev(a))
            return out
        s = ev(n.args[0])
        if name == "scale":
            return s.withColumn("cents", F.col("cents") * n.args[1].value)
        if name == "offset":
            return s.withColumn("cents", F.col("cents") + 100 * n.args[1].value)
        if name == "absolute":
            return s.withColumn("cents", F.abs("cents"))
        if name == "transformNull":
            return s.withColumn(
                "cents",
                F.coalesce(F.col("cents"), F.lit(100 * n.args[1].value)),
            )
        if name == "invert":
            return s.withColumn(
                "cents",
                F.when(
                    F.col("cents") != 0,
                    F.floor(F.lit(10000) / F.col("cents")),
                ).cast("long"),
            )
        if name == "pow":
            p = n.args[1].value
            if not 1 <= p <= 3:
                raise RenderParseError("pow exponent must be in 1..3")
            num = F.col("cents")
            for _ in range(p - 1):
                num = num * F.col("cents")
            return s.withColumn(
                "cents", F.floor(num / F.lit(100 ** (p - 1))).cast("long")
            )
        if name == "squareRoot":
            return s.withColumn(
                "cents",
                F.when(
                    F.col("cents") >= 0,
                    F.floor(F.lit(10.0) * F.sqrt(F.col("cents"))),
                ).cast("long"),
            )
        if name == "aliasByNode":
            i = n.args[1].value
            if i < 0:
                raise RenderParseError("aliasByNode index must be >= 0")
            return s.withColumn(
                "metric",
                F.coalesce(F.get(F.split("metric", "[.]"), i), F.lit("")),
            )
        if name in ("removeAboveValue", "removeBelowValue"):
            t = 100 * n.args[1].value
            keep = (F.col("cents") <= t) if name == "removeAboveValue" else (
                F.col("cents") >= t)
            return s.withColumn("cents", F.when(keep, F.col("cents")))
        if name == "grep":
            return s.where(F.col("metric").rlike(n.args[1].value))
        if name == "exclude":
            return s.where(~F.col("metric").rlike(n.args[1].value))
        if name == "alias":
            return s.withColumn("metric", F.lit(n.args[1].value))
        if name == "aliasSub":
            return s.withColumn(
                "metric",
                F.regexp_replace("metric", n.args[1].value, n.args[2].value),
            )
        if name == "isNonNull":
            return s.withColumn(
                "cents",
                F.when(F.col("cents").isNotNull(), F.lit(100))
                .otherwise(F.lit(0)).cast("long"),
            )
        if name == "scaleToSeconds":
            return s.withColumn(
                "cents",
                F.floor(
                    (F.col("cents") * n.args[1].value).cast("double") / 3600
                ).cast("long"),
            )
        if name == "roundTo":
            kd = n.args[1].value
            if not 0 <= kd <= 2:
                raise RenderParseError("roundTo decimals must be in 0..2")
            d = 10 ** (2 - kd)
            h = d // 2
            return s.withColumn(
                "cents",
                (
                    F.floor((F.col("cents") + h).cast("double") / d) * d
                ).cast("long"),
            )
        if name == "substr":
            i, j2 = n.args[1].value, n.args[2].value
            if not 0 <= i < j2:
                raise RenderParseError("substr needs 0 <= start < stop")
            parts = F.split("metric", "[.]")
            return s.withColumn(
                "metric",
                F.concat_ws(".", F.slice(parts, i + 1, j2 - i)),
            )
        raise RenderParseError(f"{name} is not streamable")

    return ev(node)


def _summarize_agg(how: str):
    if how == "sum":
        return F.sum("cents")
    if how == "max":
        return F.max("cents")
    if how == "min":
        return F.min("cents")
    if how == "last":
        return F.max_by("cents", "interval")
    if how == "avg":
        return F.floor(
            F.sum("cents").cast("double") / F.count("cents")
        ).cast("long")
    raise RenderParseError(f"summarize: unknown method {how!r}")


def _plan_below(base: DataFrame, top: Node, summarize_node) -> DataFrame:
    """(metric, interval, cents) streaming plan for the subtree
    ``top`` — ``stateless* (summarize (stateless* (seed)))?`` — over
    the level-0 cents frame ``base``; the summarize level becomes the
    watermarked tumbling window aggregate."""
    if summarize_node is not None:
        sn = summarize_node
        if sn.name == "hitcount":
            if len(sn.args) != 2 or not isinstance(sn.args[1], Num):
                raise RenderParseError("hitcount takes (series, hours)")
        elif sn.name == "groupByTags":
            pass  # (series, 'method', 'tag') — validated in its branch
        elif len(sn.args) != 3 or not isinstance(sn.args[1], Num) \
                or not isinstance(sn.args[2], Str):
            raise RenderParseError(f"{sn.name} takes (series, num, method)")
        mapped = _apply_stateless(base, sn.args[0])
        post_scale = 1
        if sn.name == "hitcount":
            # summarize-sum at the coarse grain, × slot width — the
            # scale rides the post-aggregate projection (append-safe
            # over emitted closed windows, like any stateless map).
            h = sn.args[1].value
            if h < 1:
                raise RenderParseError("hitcount bucket must be >= 1 hour")
            win_secs = 3600 * h
            how = "sum"
            post_scale = 3600
        elif sn.name == "summarize":
            h = sn.args[1].value
            if h < 1:
                raise RenderParseError("summarize bucket must be >= 1 hour")
            win_secs = 3600 * h
            how = sn.args[2].value
        elif sn.name == "groupByTags":
            # per-interval aggregate ACROSS series sharing a tag value
            # — the groupByNode shape with the tagged relabel
            # (name;key=value), window = the archive's own 1h step.
            if len(sn.args) != 3 or not isinstance(sn.args[1], Str) \
                    or not isinstance(sn.args[2], Str):
                raise RenderParseError(
                    "groupByTags takes (series, 'method', 'tag')")
            how = sn.args[1].value
            if how == "last":
                raise RenderParseError("groupByTags has no 'last' method")
            key = sn.args[2].value
            tag = (F.substring_index("metric", ";", 1) if key == "name"
                   else F.regexp_extract("metric", f";{key}=([^;]+)", 1))
            win_secs = 3600
            mapped = mapped.withColumn(
                "metric",
                F.concat(
                    F.substring_index("metric", ";", 1),
                    F.lit(";" + key + "="),
                    tag,
                ),
            )
        else:  # groupByNode: per-interval aggregate ACROSS relabeled
            # series — the window is the archive's own 1h step, so
            # each tumbling window holds exactly one interval's rows.
            i = sn.args[1].value
            if i < 0:
                raise RenderParseError("groupByNode index must be >= 0")
            how = sn.args[2].value
            if how == "last":
                raise RenderParseError("groupByNode has no 'last' method")
            win_secs = 3600
            mapped = mapped.withColumn(
                "metric",
                F.coalesce(F.get(F.split("metric", "[.]"), i), F.lit("")),
            )
        agg = (
            mapped.withColumn("ts", F.timestamp_seconds(F.col("interval")))
            .withWatermark("ts", "0 seconds")
            .groupBy(
                "metric", F.window("ts", f"{win_secs} seconds").alias("w")
            )
            .agg(_summarize_agg(how).alias("cents"))
            .select(
                "metric",
                F.col("w.start").cast("long").alias("interval"),
                (F.col("cents") * post_scale).alias("cents"),
            )
        )
        # stateless value maps ABOVE the windowed aggregate are a
        # projection over the emitted closed-window rows — append-safe.
        return _apply_stateless(base, top, stop=sn, stop_frame=agg)
    return _apply_stateless(base, top)


def _cents_base(archive_stream: DataFrame) -> DataFrame:
    return archive_stream.select(
        "metric",
        "interval",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def _to_value(frame: DataFrame) -> DataFrame:
    return frame.select(
        "metric",
        "interval",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("value"),
    )


def streaming_render_frame(archive_stream: DataFrame, target: str) -> DataFrame:
    """Streaming level-0 archive rows (metric, interval, value) →
    the rendered streaming frame (metric, interval, value) for the
    given target.  Stateless chains pass through append-trivially;
    an outermost summarize becomes a watermarked tumbling window
    aggregate (0-lateness — in-order handoff).  Targets containing an
    order-sensitive window op need the extra chained handoff —
    ``streaming_render_pass`` orchestrates it; this single-query
    entry point rejects them."""
    node = validate_target(parse_target(target))
    win, agg = check_streamable(node)
    if win is not None:
        raise RenderParseError(
            f"{win.name} needs its own chained query (two stateful "
            "operators cannot share one) — use streaming_render_pass"
        )
    return _to_value(_plan_below(_cents_base(archive_stream), node, agg))


def streaming_render_pass(
    spark: SparkSession,
    feed_schema,
    src: str,
    base: str,
    target: str,
    cfg: SeriesConfig,
    lateness_seconds: Optional[int] = None,
    await_secs: int = 600,
) -> str:
    """One availableNow pass of the chained queries: level-0 LWW
    rollup from the raw points file source, then the rendered target
    over the level-0 handoff.  A target containing an order-sensitive
    window op adds a THIRD query: the plan below the window op hands
    its closed rows off as exact cent longs, and the stateful
    trailing-window kernel (+ the stateless chain above it) renders
    from that — a streaming query cannot chain two stateful
    operators.  Checkpoints persist under ``base``, so the replay
    harness calls this once per arrival pass.  Returns the rendered
    output dir."""
    lvl0 = os.path.join(base, "level0")
    rendered = os.path.join(base, "rendered")

    def run(df, path, ckpt):
        q = (
            df.writeStream.format("parquet")
            .option("path", path)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        # RuntimeError, not assert: must survive `python -O`.
        if not q.awaitTermination(await_secs):
            raise RuntimeError("streaming render pass timed out")

    node = validate_target(parse_target(target))
    win, agg = check_streamable(node)

    run(
        streaming_rollup(
            spark.readStream.schema(feed_schema).parquet(src),
            cfg,
            0,
            lateness_seconds=lateness_seconds,
        ).select("metric", "interval", "value"),
        lvl0,
        os.path.join(base, "ckpt0"),
    )
    lvl0_stream = spark.readStream.schema(_LEVEL_SCHEMA).parquet(lvl0)
    if win is None:
        run(
            _to_value(_plan_below(_cents_base(lvl0_stream), node, agg)),
            rendered,
            os.path.join(base, "ckpt_render"),
        )
        return rendered

    from go_whisper_spark.streaming.stateful import render_window_op

    mid = os.path.join(base, "mid")
    run(
        _plan_below(_cents_base(lvl0_stream), win.args[0], agg),
        mid,
        os.path.join(base, "ckpt_mid"),
    )
    k = win.args[1].value if len(win.args) == 2 else 1
    kernel_out = render_window_op(
        spark.readStream.schema(
            "metric string, interval long, cents long"
        ).parquet(mid),
        win.name,
        k,
    )
    # the chain above the window op is pure single-spine stateless
    # (check_streamable forbids seeds/group branches up there), so the
    # seed frame is never consulted — kernel_out stands in for it.
    run(
        _to_value(
            _apply_stateless(kernel_out, node, stop=win,
                             stop_frame=kernel_out)
        ),
        rendered,
        os.path.join(base, "ckpt_render"),
    )
    return rendered
