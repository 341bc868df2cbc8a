"""Graphite render-target expression layer: parse a nested target
string — ``movingSum(scale(grep(seriesByGlob('*'), '^(c|v)'), 3), 4)``
— and compose it into ONE declarative DataFrame pipeline over the
standard series frame, exactly the way a Graphite user writes queries
against the reference ecosystem's render API.

Two visitors walk the same AST:

- ``build_frame``  — the Spark plan: each operator is a narrow
  DataFrame transform (filter / projection / window / small-key
  aggregate) composed lazily, so the WHOLE expression is one logical
  plan for Catalyst — filters written innermost still push to the
  scan, windows share the per-metric partitioning, and nothing
  materializes between operators.
- ``build_sql``    — the matching DuckDB oracle: each operator wraps
  the previous SQL in a subquery applying the identical arithmetic.

Exactness contract: all VALUE arithmetic runs in integer CENTS
(``round(value*100)`` longs) from the seed until the single final
``cents / 100.0`` projection, so every composition — scales, offsets,
window sums, cross-series sums, derivatives — is exact 64-bit integer
math in BOTH engines and the driver's typed hash cannot drift.
Numeric operator arguments are therefore integers (Graphite's float
args quantize to cents here; documented, not hidden).

Operator registry (v1 — the composable core; the ~111 fixed-form
analogs in ``operators/graphite_funcs.py`` remain the coverage
surface):

  seriesByGlob('pat')   seed: glob over metric names (* ? — translated
                        to an anchored regex identically in both engines)
  scale(s, k)           cents * k
  offset(s, k)          cents + 100·k
  absolute(s)           |cents|
  derivative(s)         cents − lag(cents) per metric (first slot NULL)
  movingSum(s, n)       rolling sum over n slots (current + n−1 prior)
  sumSeries(s)          one series: per-interval cent sum
  maximumAbove(s, t)    keep metrics whose peak exceeds t (cent compare)
  grep(s, 're')         metric regex filter (patterns limited to the
                        Java∩RE2-common subset, same rule as g_grep)
  aliasSub(s,'re','rep') metric rename via regexp_replace

Scale shape: seeds and filters are scan-adjacent; per-series operators
ride ONE (metric)-partitioned window chain; ``sumSeries`` is the only
cross-series shuffle (per-interval partial aggregate).  An expression
tree of depth d costs at most d narrow stages + the aggregates it
names — no driver-side evaluation anywhere.

[ref: SURVEY.md §2C Graphite render functions — this is the
composition layer over the same semantics; the reference target
syntax is public Graphite documentation.]
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List, Union

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


# ------------------------------------------------------------------ AST
@dataclass
class Call:
    name: str
    args: List["Node"]


@dataclass
class Glob:
    pattern: str


@dataclass
class Num:
    value: int


@dataclass
class Str:
    value: str


Node = Union[Call, Glob, Num, Str]


class RenderParseError(ValueError):
    pass


# `name` covers both function identifiers and bare series globs
# ("web.*.cpu") — the parser disambiguates: a name followed by "(" that
# is a plain identifier is a function call, anything else is a glob.
# A separate word/glob split would cut "web.*.cpu" at the first dot.
_TOKEN = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)"
    r"|(?P<str>'[^']*'|\"[^\"]*\")"
    r"|(?P<num>-?\d+(?![A-Za-z0-9_*?.\[\]-]))"
    r"|(?P<name>[A-Za-z0-9_*?.\[\]-]+))"
)

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def tokenize(text: str):
    pos, out = 0, []
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip() == "":
                break
            raise RenderParseError(f"bad token at {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


def parse_target(text: str) -> Node:
    """Recursive-descent parse of one render target expression."""
    toks = tokenize(text)
    i = 0

    def peek():
        return toks[i] if i < len(toks) else (None, None)

    def expr() -> Node:
        nonlocal i
        kind, val = peek()
        if kind is None:
            raise RenderParseError("unexpected end of target")
        if kind == "str":
            i += 1
            return Str(val[1:-1])
        if kind == "num":
            i += 1
            return Num(int(val))
        if kind == "name":
            i += 1
            nk, _ = peek()
            if _IDENT.match(val) and nk == "lparen":
                i += 1  # consume (
                args: List[Node] = []
                if peek()[0] != "rparen":
                    args.append(expr())
                    while peek()[0] == "comma":
                        i += 1
                        args.append(expr())
                if peek()[0] != "rparen":
                    raise RenderParseError(f"missing ) in {text!r}")
                i += 1
                return Call(val, args)
            # bare word/glob = a series glob, as in Graphite targets
            return Glob(val)
        raise RenderParseError(f"unexpected token {val!r}")

    node = expr()
    if i != len(toks):
        raise RenderParseError(f"trailing tokens in {text!r}: {toks[i:]}")
    return node


def glob_to_regex(pattern: str) -> str:
    """Graphite glob → anchored regex, restricted to syntax that means
    the same thing in Java regex and DuckDB's RE2: ``*`` → ``[^.]*``,
    ``?`` → ``.``, everything else escaped."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("[^.]*")
        elif ch == "?":
            out.append(".")
        elif ch in ".[]()\\^$+{}|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"


# ----------------------------------------------------------- evaluators
def _need(node: Call, n: int, kinds) -> None:
    if len(node.args) != n:
        raise RenderParseError(f"{node.name} takes {n} args, got {len(node.args)}")
    for a, k in zip(node.args, kinds):
        if not isinstance(a, k):
            raise RenderParseError(
                f"{node.name}: expected {k.__name__}, got {type(a).__name__}"
            )


def build_frame(spark: SparkSession, sf_dir: str, node: Node) -> DataFrame:
    """AST → composed DataFrame of (metric, interval, cents)."""
    from go_whisper_spark.operators.graphite_funcs import _cents, _lww1h

    def seed(pattern: str) -> DataFrame:
        return (
            _lww1h(spark, sf_dir)
            .where(F.col("metric").rlike(glob_to_regex(pattern)))
            .select("metric", "interval", _cents().alias("cents"))
        )

    w = Window.partitionBy("metric").orderBy("interval")

    def ev(n: Node) -> DataFrame:
        if isinstance(n, Glob):
            return seed(n.pattern)
        if isinstance(n, Str):
            return seed(n.value)
        if not isinstance(n, Call):
            raise RenderParseError(f"series expression expected, got {n}")
        name = n.name
        if name == "seriesByGlob":
            _need(n, 1, (Str,))
            return seed(n.args[0].value)
        if name == "scale":
            _need(n, 2, (object, Num))
            s = ev(n.args[0])
            return s.withColumn("cents", F.col("cents") * n.args[1].value)
        if name == "offset":
            _need(n, 2, (object, Num))
            s = ev(n.args[0])
            return s.withColumn("cents", F.col("cents") + 100 * n.args[1].value)
        if name == "absolute":
            _need(n, 1, (object,))
            return ev(n.args[0]).withColumn("cents", F.abs("cents"))
        if name == "derivative":
            _need(n, 1, (object,))
            return ev(n.args[0]).withColumn(
                "cents", F.col("cents") - F.lag("cents").over(w)
            )
        if name == "movingSum":
            _need(n, 2, (object, Num))
            k = n.args[1].value
            if k < 1:
                raise RenderParseError("movingSum window must be >= 1")
            return ev(n.args[0]).withColumn(
                "cents", F.sum("cents").over(w.rowsBetween(-(k - 1), 0))
            )
        if name == "nonNegativeDerivative":
            _need(n, 1, (object,))
            d = F.col("cents") - F.lag("cents").over(w)
            return ev(n.args[0]).withColumn(
                "cents", F.when(d >= 0, d)
            )
        if name == "transformNull":
            _need(n, 2, (object, Num))
            return ev(n.args[0]).withColumn(
                "cents",
                F.coalesce(F.col("cents"), F.lit(100 * n.args[1].value)),
            )
        if name == "keepLastValue":
            # last-ignorenulls over the running frame INCLUDES the
            # current row, so non-null slots pass through unchanged.
            _need(n, 1, (object,))
            return ev(n.args[0]).withColumn(
                "cents",
                F.last("cents", ignorenulls=True).over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        if name == "highestMax":
            # Fixed-size winner set (k rows) — the one selector whose
            # join-back keeps an explicit broadcast hint, like the
            # top-k family in graphite_funcs.
            _need(n, 2, (object, Num))
            k = n.args[1].value
            if k < 1:
                raise RenderParseError("highestMax k must be >= 1")
            s = ev(n.args[0])
            top = (
                s.groupBy("metric")
                .agg(F.max("cents").alias("mx"))
                .orderBy(F.desc("mx"), F.asc("metric"))
                .limit(k)
                .select("metric")
            )
            return s.join(F.broadcast(top), "metric")
        if name == "movingAverage":
            # Floored-CENT mean over the window (exact integer math;
            # Graphite's float mean quantizes to 2 decimals here —
            # same documented cent contract as every arithmetic op).
            _need(n, 2, (object, Num))
            k = n.args[1].value
            if k < 1:
                raise RenderParseError("movingAverage window must be >= 1")
            fr = w.rowsBetween(-(k - 1), 0)
            return ev(n.args[0]).withColumn(
                "cents",
                F.floor(
                    F.sum("cents").over(fr).cast("double")
                    / F.count("cents").over(fr)
                ).cast("long"),
            )
        if name == "summarize":
            # summarize(s, hours, 'sum'|'max'|'min'|'last'|'avg'):
            # epoch-aligned coarse buckets per metric — whisper's
            # consolidation as a render op.  'avg' floors to exact
            # cents; 'last' = value at the max interval in the bucket
            # (max_by, unique per (metric, interval)).
            _need(n, 3, (object, Num, Str))
            h = n.args[1].value
            if h < 1:
                raise RenderParseError("summarize bucket must be >= 1 hour")
            how = n.args[2].value
            b = 3600 * h
            if how == "sum":
                agg = F.sum("cents")
            elif how == "max":
                agg = F.max("cents")
            elif how == "min":
                agg = F.min("cents")
            elif how == "last":
                # the fine interval must stay addressable for max_by,
                # so the bucket gets its own column pre-grouping
                agg = F.max_by("cents", "interval")
            elif how == "avg":
                agg = F.floor(
                    F.sum("cents").cast("double") / F.count("cents")
                ).cast("long")
            else:
                raise RenderParseError(f"summarize: unknown method {how!r}")
            return (
                ev(n.args[0])
                .withColumn("bucket", F.col("interval") - F.col("interval") % b)
                .groupBy("metric", "bucket")
                .agg(agg.alias("cents"))
                .select("metric", F.col("bucket").alias("interval"), "cents")
            )
        if name == "sumSeries":
            _need(n, 1, (object,))
            return (
                ev(n.args[0])
                .groupBy("interval")
                .agg(F.sum("cents").alias("cents"))
                .select(F.lit("sumSeries").alias("metric"), "interval", "cents")
            )
        if name == "averageSeries":
            _need(n, 1, (object,))
            return (
                ev(n.args[0])
                .groupBy("interval")
                .agg(
                    F.floor(
                        F.sum("cents").cast("double") / F.count("cents")
                    ).cast("long").alias("cents")
                )
                .select(
                    F.lit("averageSeries").alias("metric"), "interval", "cents"
                )
            )
        if name == "maximumAbove":
            _need(n, 2, (object, Num))
            s = ev(n.args[0])
            winners = (
                s.groupBy("metric")
                .agg(F.max("cents").alias("mx"))
                .where(F.col("mx") > 100 * n.args[1].value)
                .select("metric")
            )
            # un-hinted O(n_metrics) join-back — AQE sizes it (the
            # selector-family policy, docs/SCALE.md).
            return s.join(winners, "metric")
        if name == "grep":
            _need(n, 2, (object, Str))
            return ev(n.args[0]).where(F.col("metric").rlike(n.args[1].value))
        if name == "exclude":
            _need(n, 2, (object, Str))
            return ev(n.args[0]).where(~F.col("metric").rlike(n.args[1].value))
        if name == "currentAbove":
            # most-recent slot (max_by on interval — unique per
            # metric) over the threshold; un-hinted join-back.
            _need(n, 2, (object, Num))
            s = ev(n.args[0])
            winners = (
                s.groupBy("metric")
                .agg(F.max_by("cents", "interval").alias("cur"))
                .where(F.col("cur") > 100 * n.args[1].value)
                .select("metric")
            )
            return s.join(winners, "metric")
        if name == "averageAbove":
            # exact integer compare: sum_cents > t·100·n — no float
            # average ever materializes for the decision.
            _need(n, 2, (object, Num))
            s = ev(n.args[0])
            winners = (
                s.groupBy("metric")
                .agg(F.sum("cents").alias("sc"), F.count("cents").alias("nn"))
                .where(F.col("sc") > 100 * n.args[1].value * F.col("nn"))
                .select("metric")
            )
            return s.join(winners, "metric")
        if name == "alias":
            _need(n, 2, (object, Str))
            return ev(n.args[0]).withColumn("metric", F.lit(n.args[1].value))
        if name == "timeShift":
            _need(n, 2, (object, Num))
            # timeShift(s, h): plot the series h hours EARLIER — add
            # h·3600 to each interval (Graphite's '-1h' pulls
            # yesterday's data onto today's axis; integer seconds).
            return ev(n.args[0]).withColumn(
                "interval", F.col("interval") + 3600 * n.args[1].value
            )
        if name == "integral":
            _need(n, 1, (object,))
            return ev(n.args[0]).withColumn(
                "cents",
                F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)),
            )
        if name == "countSeries":
            _need(n, 1, (object,))
            return (
                ev(n.args[0])
                .groupBy("interval")
                .agg(F.count("*").alias("cnt"))
                .select(
                    F.lit("countSeries").alias("metric"),
                    "interval",
                    (F.col("cnt") * 100).alias("cents"),
                )
            )
        if name == "aliasSub":
            _need(n, 3, (object, Str, Str))
            return ev(n.args[0]).withColumn(
                "metric",
                F.regexp_replace("metric", n.args[1].value, n.args[2].value),
            )
        if name == "group":
            # group(a, b, ...): bag union of any number of series
            # expressions — Graphite's list combinator, what lets one
            # render mix differently-transformed families.
            if not n.args:
                raise RenderParseError("group needs at least one series")
            frames = [ev(a) for a in n.args]
            out = frames[0]
            for f2 in frames[1:]:
                out = out.unionByName(f2)
            return out
        if name in ("diffSeries", "divideSeries", "asPercent"):
            # Binary combiners over per-interval single series: each
            # side must already be one series (reduce multi-series
            # args with sumSeries/alias first — documented contract;
            # Graphite's flatten-first-minus-rest list semantics are
            # reachable through that reduction).  Join key = interval;
            # LEFT join keeps the left series' slots (missing right →
            # NULL, Graphite's None-propagation).  diff is exact cent
            # subtraction; divide/asPercent are cent-quantized exact
            # ratios: floor(a·100/b) and floor(a·10000/b) — integer
            # math both engines, NULL on b = 0.
            _need(n, 2, (object, object))
            a = ev(n.args[0]).select(
                "metric", "interval", F.col("cents").alias("a_c")
            )
            b = ev(n.args[1]).select(
                F.col("interval").alias("b_iv"), F.col("cents").alias("b_c")
            )
            j = a.join(b, a.interval == b.b_iv, "left")
            label = F.concat(F.lit(name + "("), F.col("metric"), F.lit(")"))
            if name == "diffSeries":
                out = F.col("a_c") - F.col("b_c")
            elif name == "divideSeries":
                out = F.when(
                    F.col("b_c") != 0,
                    F.floor((F.col("a_c") * 100).cast("double") / F.col("b_c")),
                ).cast("long")
            else:  # asPercent
                out = F.when(
                    F.col("b_c") != 0,
                    F.floor((F.col("a_c") * 10000).cast("double") / F.col("b_c")),
                ).cast("long")
            return j.select(
                label.alias("metric"), "interval", out.alias("cents")
            )
        raise RenderParseError(f"unknown render function {name!r}")

    return ev(node)


def render(spark: SparkSession, sf_dir: str, target: str) -> DataFrame:
    """Evaluate one Graphite render target over the 1h LWW series
    frame; output (metric, interval, value) with the single final
    cents→value projection."""
    frame = build_frame(spark, sf_dir, parse_target(target))
    return frame.select(
        "metric",
        "interval",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("value"),
    )


# ------------------------------------------------------- oracle visitor
def build_sql(node: Node) -> str:
    """AST → DuckDB subquery producing (metric, interval, cents) —
    arithmetic identical to ``build_frame`` step for step."""
    from go_whisper_spark.operators.whisper_queries import (
        CENTS_SQL,
        LWW_1H_CTE,
        PTS_CTE,
    )

    def seed(pattern: str) -> str:
        rx = glob_to_regex(pattern).replace("'", "''")
        return (
            f"(SELECT metric, interval, {CENTS_SQL} AS cents FROM lww1h "
            f"WHERE regexp_matches(metric, '{rx}'))"
        )

    def ev(n: Node) -> str:
        if isinstance(n, Glob):
            return seed(n.pattern)
        if isinstance(n, Str):
            return seed(n.value)
        if not isinstance(n, Call):
            raise RenderParseError(f"series expression expected, got {n}")
        name = n.name
        if name == "seriesByGlob":
            return seed(n.args[0].value)
        if name == "scale":
            return (
                f"(SELECT metric, interval, cents * {n.args[1].value} AS cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "offset":
            return (
                f"(SELECT metric, interval, cents + {100 * n.args[1].value} "
                f"AS cents FROM {ev(n.args[0])} s)"
            )
        if name == "absolute":
            return (
                f"(SELECT metric, interval, abs(cents) AS cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "derivative":
            return (
                "(SELECT metric, interval, cents - lag(cents) OVER "
                "(PARTITION BY metric ORDER BY interval) AS cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "movingSum":
            k = n.args[1].value
            return (
                "(SELECT metric, interval, sum(cents) OVER "
                "(PARTITION BY metric ORDER BY interval "
                f"ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW) AS cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "nonNegativeDerivative":
            return (
                "(SELECT metric, interval, CASE WHEN d >= 0 THEN d END AS cents "
                "FROM (SELECT metric, interval, cents - lag(cents) OVER "
                "(PARTITION BY metric ORDER BY interval) AS d "
                f"FROM {ev(n.args[0])} s) t)"
            )
        if name == "transformNull":
            return (
                f"(SELECT metric, interval, "
                f"coalesce(cents, {100 * n.args[1].value}) AS cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "keepLastValue":
            return (
                "(SELECT metric, interval, "
                "last_value(cents IGNORE NULLS) OVER "
                "(PARTITION BY metric ORDER BY interval "
                "ROWS UNBOUNDED PRECEDING) AS cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "highestMax":
            k = n.args[1].value
            inner = ev(n.args[0])
            return (
                f"(SELECT s.metric, s.interval, s.cents FROM {inner} s "
                f"JOIN (SELECT metric FROM {inner} g GROUP BY metric "
                f"ORDER BY max(cents) DESC, metric ASC LIMIT {k}) w "
                f"ON s.metric = w.metric)"
            )
        if name == "movingAverage":
            k = n.args[1].value
            fr = (f"OVER (PARTITION BY metric ORDER BY interval "
                  f"ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW)")
            return (
                f"(SELECT metric, interval, CAST(floor("
                f"CAST(sum(cents) {fr} AS DOUBLE) / count(cents) {fr}"
                f") AS BIGINT) AS cents FROM {ev(n.args[0])} s)"
            )
        if name == "summarize":
            b = 3600 * n.args[1].value
            how = n.args[2].value
            agg = {
                "sum": "CAST(sum(cents) AS BIGINT)",
                "max": "max(cents)",
                "min": "min(cents)",
                "last": "arg_max(cents, interval)",
                "avg": ("CAST(floor(CAST(sum(cents) AS DOUBLE) / count(cents))"
                        " AS BIGINT)"),
            }.get(how)
            if agg is None:
                raise RenderParseError(f"summarize: unknown method {how!r}")
            return (
                f"(SELECT metric, interval - interval % {b} AS interval, "
                f"{agg} AS cents FROM {ev(n.args[0])} s "
                f"GROUP BY metric, interval - interval % {b})"
            )
        if name == "sumSeries":
            return (
                "(SELECT 'sumSeries' AS metric, interval, "
                "CAST(sum(cents) AS BIGINT) AS cents "
                f"FROM {ev(n.args[0])} s GROUP BY interval)"
            )
        if name == "averageSeries":
            return (
                "(SELECT 'averageSeries' AS metric, interval, "
                "CAST(floor(CAST(sum(cents) AS DOUBLE) / count(cents)) "
                "AS BIGINT) AS cents "
                f"FROM {ev(n.args[0])} s GROUP BY interval)"
            )
        if name == "maximumAbove":
            t = 100 * n.args[1].value
            inner = ev(n.args[0])
            return (
                f"(SELECT s.metric, s.interval, s.cents FROM {inner} s "
                f"JOIN (SELECT metric FROM {inner} g GROUP BY metric "
                f"HAVING max(cents) > {t}) w ON s.metric = w.metric)"
            )
        if name == "grep":
            rx = n.args[1].value.replace("'", "''")
            return (
                f"(SELECT metric, interval, cents FROM {ev(n.args[0])} s "
                f"WHERE regexp_matches(metric, '{rx}'))"
            )
        if name == "exclude":
            rx = n.args[1].value.replace("'", "''")
            return (
                f"(SELECT metric, interval, cents FROM {ev(n.args[0])} s "
                f"WHERE NOT regexp_matches(metric, '{rx}'))"
            )
        if name == "currentAbove":
            t = 100 * n.args[1].value
            inner = ev(n.args[0])
            return (
                f"(SELECT s.metric, s.interval, s.cents FROM {inner} s "
                f"JOIN (SELECT metric FROM {inner} g GROUP BY metric "
                f"HAVING arg_max(cents, interval) > {t}) w "
                f"ON s.metric = w.metric)"
            )
        if name == "averageAbove":
            t = 100 * n.args[1].value
            inner = ev(n.args[0])
            return (
                f"(SELECT s.metric, s.interval, s.cents FROM {inner} s "
                f"JOIN (SELECT metric FROM {inner} g GROUP BY metric "
                f"HAVING sum(cents) > {t} * count(cents)) w "
                f"ON s.metric = w.metric)"
            )
        if name == "alias":
            lit = n.args[1].value.replace("'", "''")
            return (
                f"(SELECT '{lit}' AS metric, interval, cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "timeShift":
            return (
                f"(SELECT metric, interval + {3600 * n.args[1].value} "
                f"AS interval, cents FROM {ev(n.args[0])} s)"
            )
        if name == "integral":
            return (
                "(SELECT metric, interval, sum(cents) OVER "
                "(PARTITION BY metric ORDER BY interval "
                "ROWS UNBOUNDED PRECEDING) AS cents "
                f"FROM {ev(n.args[0])} s)"
            )
        if name == "countSeries":
            return (
                "(SELECT 'countSeries' AS metric, interval, "
                "count(*) * 100 AS cents "
                f"FROM {ev(n.args[0])} s GROUP BY interval)"
            )
        if name == "aliasSub":
            rx = n.args[1].value.replace("'", "''")
            rep = n.args[2].value.replace("'", "''")
            return (
                f"(SELECT regexp_replace(metric, '{rx}', '{rep}') AS metric, "
                f"interval, cents FROM {ev(n.args[0])} s)"
            )
        if name == "group":
            parts = " UNION ALL ".join(
                f"SELECT metric, interval, cents FROM {ev(a)} g{i}"
                for i, a in enumerate(n.args)
            )
            return f"({parts})"
        if name in ("diffSeries", "divideSeries", "asPercent"):
            a, b = ev(n.args[0]), ev(n.args[1])
            if name == "diffSeries":
                out = "a.cents - b.cents"
            elif name == "divideSeries":
                out = ("CASE WHEN b.cents != 0 THEN CAST(floor("
                       "CAST(a.cents * 100 AS DOUBLE) / b.cents) AS BIGINT) "
                       "END")
            else:
                out = ("CASE WHEN b.cents != 0 THEN CAST(floor("
                       "CAST(a.cents * 10000 AS DOUBLE) / b.cents) AS BIGINT) "
                       "END")
            return (
                f"(SELECT '{name}(' || a.metric || ')' AS metric, "
                f"a.interval, {out} AS cents "
                f"FROM {a} a LEFT JOIN {b} b ON a.interval = b.interval)"
            )
        raise RenderParseError(f"unknown render function {name!r}")

    body = ev(node)
    return (
        f"WITH {PTS_CTE}, {LWW_1H_CTE}\n"
        "SELECT metric, interval, CAST(cents AS DOUBLE) / 100.0 AS value\n"
        f"FROM {body} q"
    )


def render_oracle_sql(target: str) -> str:
    return build_sql(parse_target(target))
