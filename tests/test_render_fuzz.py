"""Property fuzz: random render expressions evaluated BOTH ways —
the Spark composition vs the AST-emitted DuckDB SQL — must agree
exactly (the cent discipline makes every composition integer-exact).

Deterministic seed; bounded depth; covers every operator in the
registry (130 ops as of round 15) including binary combiners, aggregate
reducers, the selector family, the round-11 additions (waves 2-8),
and the generic method-string spellings (aggregate / movingWindow /
highest / lowest / filterSeries — desugared by the parser, so the
fuzz exercises the dispatch too).  identity/timeFunction are fuzz-
EXCLUDED by design: their epoch-magnitude cents (~1.8e11) would
overflow a composed pow(), where DuckDB errors and Spark wraps —
they get dedicated exactness tests instead.  Candidates that the
static analyzer rejects (window op over a possibly-duplicate-keyed
frame, non-single binary right side) are skipped and redrawn — the
rejection path itself is asserted separately in test_render.py.

Results compare as multiset Counters, not sets: group() compositions
can legitimately emit duplicate (metric, interval, value) rows, and a
divergence that only changes row counts must fail (ADVICE r10).
"""

import math
import random
from collections import Counter

import duckdb

from go_whisper_spark.render import (
    RenderParseError,
    parse_target,
    render,
    render_oracle_sql,
    validate_target,
)

_GLOBS = ["'*'", "'c*'", "'[ve]*'", "'p?rchase'"]

_TAG_SEEDS = [
    "seriesByTag('dc=dc1')",
    "seriesByTag('name=~^(click|error)$', 'dc=dc1')",
    "seriesByTag('host!=h3')",
    "seriesByTag('dc!=~dc[02]', 'name=view')",
]

_UNARY = [
    "absolute", "derivative", "nonNegativeDerivative", "keepLastValue",
    "integral", "perSecond", "offsetToZero", "changed", "invert",
    "squareRoot", "holtWintersForecast", "holtWintersConfidenceUpper",
    "holtWintersConfidenceLower", "holtWintersAberration",
    "isNonNull", "removeEmptySeries", "interpolate", "minMax",
    "linearRegression",
]
_SELECTORS = [
    "maximumAbove", "maximumBelow", "minimumAbove", "minimumBelow",
    "averageAbove", "averageBelow", "currentAbove", "currentBelow",
]


def _series(rng, depth):
    """Random series expression (validity enforced post-hoc by
    validate_target — the draw loop in the test redraws rejects)."""
    if depth <= 0:
        # 1-in-5 draws seed the TAGGED universe instead of a glob
        if rng.random() < 0.2:
            return rng.choice(_TAG_SEEDS)
        return rng.choice(_GLOBS)
    name = rng.choice(
        _UNARY
        + _SELECTORS
        + [
            "scale", "offset", "movingSum", "movingAverage",
            "movingMin", "movingMax", "pow", "limit",
            "integralByInterval",
            "transformNull", "timeShift", "delay", "grep", "exclude",
            "highestMax", "highestAverage", "lowestAverage",
            "removeAboveValue", "removeBelowValue",
            "removeAbovePercentile", "removeBelowPercentile",
            "mostDeviant", "nPercentile", "timeSlice",
            "aliasByNode", "averageOutsidePercentile",
            "alias", "aliasSub", "sumSeries", "averageSeries",
            "countSeries", "minSeries", "maxSeries", "rangeOfSeries",
            "stddevSeries", "percentileOfSeries", "constantLine",
            "verticalLine",
            "summarize", "groupByNode",
            "diffSeries", "divideSeries", "asPercent", "group",
            "threshold", "hitcount", "scaleToSeconds",
            "highestCurrent", "lowestCurrent", "stdev",
            "aggregateLine", "removeBetweenPercentile",
            "sumSeriesWithWildcards", "averageSeriesWithWildcards",
            "multiplySeriesWithWildcards", "drawAsInfinite",
            "substr", "fallbackSeries", "multiplySeries",
            "roundTo", "movingMedian", "exponentialMovingAverage",
            "weightedAverage", "randomWalk", "stacked", "useSeriesAbove",
            "timeStack", "nonNegativeDerivativeWrap", "keepLastValueLimit",
            "groupByTags", "aliasByTags", "perSecondWrap",
            "filterSeries", "smartSummarize", "asPercentTotal",
            "divideSeriesLists", "cactiStyle", "aggregate",
            "movingWindow", "highestLowest", "add",
            "aggregateWithWildcards",
            "aggregateSeriesLists", "seriesListsSugar", "unique",
            "applyByNode", "areaBetween", "groupByNodes",
            "aliasByMetric", "legendValue", "summarizeXff",
            "interpolateLimit", "removeEmptySeriesXff",
            "hwConfidenceArea",
        ]
    )
    if name in _UNARY:
        return f"{name}({_series(rng, depth - 1)})"
    if name in _SELECTORS:
        t = rng.choice([-1, 0, 40, 51, 300])
        return f"{name}({_series(rng, depth - 1)}, {t})"
    if name in ("removeAboveValue", "removeBelowValue"):
        return f"{name}({_series(rng, depth - 1)}, {rng.choice([40, 52, 60])})"
    if name in ("removeAbovePercentile", "removeBelowPercentile"):
        return f"{name}({_series(rng, depth - 1)}, {rng.choice([10, 50, 90])})"
    if name in ("highestMax", "highestAverage", "lowestAverage",
                "mostDeviant"):
        return f"{name}({_series(rng, depth - 1)}, {rng.randint(1, 4)})"
    if name == "nPercentile":
        return f"nPercentile({_series(rng, depth - 1)}, {rng.choice([25, 50, 95])})"
    if name == "aliasByNode":
        # 1-in-3 draws exercise the multi-index form (round 14)
        idxs = (f"{rng.randint(0, 1)}, {rng.randint(0, 2)}"
                if rng.random() < 0.34 else str(rng.randint(0, 1)))
        return f"aliasByNode({_series(rng, depth - 1)}, {idxs})"
    if name == "interpolateLimit":
        return (f"interpolate({_series(rng, depth - 1)}, "
                f"{rng.randint(1, 5)})")
    if name == "removeEmptySeriesXff":
        return (f"removeEmptySeries({_series(rng, depth - 1)}, "
                f"{rng.choice([25, 60, 89, 100])})")
    if name == "hwConfidenceArea":
        # areaBetween requires both sides single+unique: reduce first
        return f"holtWintersConfidenceArea(sumSeries({_series(rng, depth - 1)}))"
    if name == "averageOutsidePercentile":
        return f"averageOutsidePercentile({_series(rng, depth - 1)}, {rng.choice([10, 25, 50])})"
    if name == "timeSlice":
        a = rng.randint(0, 200)
        return f"timeSlice({_series(rng, depth - 1)}, {a}, {a + rng.randint(1, 400)})"
    if name == "summarize":
        how = rng.choice(["sum", "max", "min", "last", "avg"])
        return f"summarize({_series(rng, depth - 1)}, {rng.randint(1, 8)}, '{how}')"
    if name in ("scale", "offset", "timeShift"):
        return f"{name}({_series(rng, depth - 1)}, {rng.randint(-3, 5)})"
    if name in ("movingSum", "movingAverage", "movingMin", "movingMax"):
        return f"{name}({_series(rng, depth - 1)}, {rng.randint(1, 6)})"
    if name == "pow":
        return f"pow({_series(rng, depth - 1)}, {rng.randint(1, 3)})"
    if name == "limit":
        return f"limit({_series(rng, depth - 1)}, {rng.randint(1, 4)})"
    if name == "integralByInterval":
        return f"integralByInterval({_series(rng, depth - 1)}, {rng.randint(1, 8)})"
    if name == "delay":
        return f"delay({_series(rng, depth - 1)}, {rng.randint(0, 3)})"
    if name == "transformNull":
        return f"{name}({_series(rng, depth - 1)}, {rng.randint(-2, 2)})"
    if name == "grep":
        pat = rng.choice(["^(c|v)", "^[es]", "r"])
        return f"grep({_series(rng, depth - 1)}, '{pat}')"
    if name == "exclude":
        return f"exclude({_series(rng, depth - 1)}, '{rng.choice(['^c', '^[ve]', 'q'])}')"
    if name == "alias":
        return f"alias({_series(rng, depth - 1)}, 'a{rng.randint(0, 9)}')"
    if name == "aliasSub":
        return f"aliasSub({_series(rng, depth - 1)}, '^c', 'K')"
    if name in ("sumSeries", "averageSeries", "countSeries", "minSeries",
                "maxSeries", "rangeOfSeries", "stddevSeries"):
        return f"{name}({_series(rng, depth - 1)})"
    if name == "percentileOfSeries":
        return f"percentileOfSeries({_series(rng, depth - 1)}, {rng.choice([25, 50, 90])})"
    if name == "constantLine":
        return f"constantLine({rng.randint(-2, 5)})"
    if name == "verticalLine":
        return f"verticalLine({rng.randint(0, 30)}, 'vl{rng.randint(0, 3)}')"
    if name == "threshold":
        return f"threshold({rng.randint(-2, 5)})"
    if name == "groupByNode":
        how = rng.choice(["sum", "max", "min", "avg"])
        return f"groupByNode({_series(rng, depth - 1)}, {rng.randint(0, 1)}, '{how}')"
    if name == "hitcount":
        return f"hitcount({_series(rng, depth - 1)}, {rng.randint(1, 8)})"
    if name == "scaleToSeconds":
        return f"scaleToSeconds({_series(rng, depth - 1)}, {rng.randint(1, 7200)})"
    if name in ("highestCurrent", "lowestCurrent"):
        return f"{name}({_series(rng, depth - 1)}, {rng.randint(1, 4)})"
    if name == "stdev":
        return f"stdev({_series(rng, depth - 1)}, {rng.randint(1, 6)})"
    if name == "aggregateLine":
        how = rng.choice(["avg", "max", "min"])
        return f"aggregateLine({_series(rng, depth - 1)}, '{how}')"
    if name == "removeBetweenPercentile":
        return f"removeBetweenPercentile({_series(rng, depth - 1)}, {rng.choice([10, 25, 40])})"
    if name in ("sumSeriesWithWildcards", "averageSeriesWithWildcards",
                "multiplySeriesWithWildcards"):
        return f"{name}({_series(rng, depth - 1)}, {rng.randint(0, 2)})"
    if name == "drawAsInfinite":
        return f"drawAsInfinite({_series(rng, depth - 1)})"
    if name == "aggregateWithWildcards":
        how = rng.choice(["sum", "average", "max", "min", "multiply"])
        return (f"aggregateWithWildcards({_series(rng, depth - 1)}, "
                f"'{how}', {rng.randint(0, 2)})")
    if name == "substr":
        i = rng.randint(0, 1)
        return f"substr({_series(rng, depth - 1)}, {i}, {i + rng.randint(1, 2)})"
    if name == "fallbackSeries":
        a = _series(rng, depth - 1)
        b = _series(rng, depth - 1)
        return f"fallbackSeries({a}, {b})"
    if name == "roundTo":
        return f"roundTo({_series(rng, depth - 1)}, {rng.randint(0, 2)})"
    if name == "movingMedian":
        return f"movingMedian({_series(rng, depth - 1)}, {rng.randint(1, 6)})"
    if name == "exponentialMovingAverage":
        return f"exponentialMovingAverage({_series(rng, depth - 1)}, {rng.randint(1, 8)})"
    if name == "weightedAverage":
        a = _series(rng, depth - 1)
        b = _series(rng, depth - 1)
        return f"weightedAverage({a}, {b}, {rng.randint(0, 1)})"
    if name == "randomWalk":
        return f"randomWalk('rw{rng.randint(0, 3)}')"
    if name == "stacked":
        return f"stacked({_series(rng, depth - 1)})"
    if name == "useSeriesAbove":
        return (f"useSeriesAbove({_series(rng, depth - 1)}, "
                f"{rng.choice([-1, 40, 300])}, '^', 'hot.')")
    if name == "timeStack":
        a = rng.randint(0, 1)
        shift = rng.choice([str(rng.randint(1, 2)), "'6h'", "'12h'", "'1d'"])
        return (f"timeStack({_series(rng, depth - 1)}, {shift}, "
                f"{a}, {a + rng.randint(1, 3)})")
    if name == "nonNegativeDerivativeWrap":
        return (f"nonNegativeDerivative({_series(rng, depth - 1)}, "
                f"{rng.choice([600, 1000])})")
    if name == "perSecondWrap":
        return (f"perSecond({_series(rng, depth - 1)}, "
                f"{rng.choice([600, 1000])})")
    if name == "keepLastValueLimit":
        return (f"keepLastValue({_series(rng, depth - 1)}, "
                f"{rng.randint(1, 4)})")
    if name == "groupByTags":
        how = rng.choice(["sum", "max", "min", "avg"])
        tag = rng.choice(["dc", "host"])
        return f"groupByTags({rng.choice(_TAG_SEEDS)}, '{how}', '{tag}')"
    if name == "aliasByTags":
        keys = rng.sample(["name", "dc", "host"], rng.randint(1, 2))
        args = ", ".join(f"'{k}'" for k in keys)
        return f"aliasByTags({rng.choice(_TAG_SEEDS)}, {args})"
    if name == "filterSeries":
        func = rng.choice(["max", "min", "sum", "average", "current"])
        op = rng.choice([">", ">=", "<", "<=", "=", "!="])
        t = rng.choice([-1, 0, 40, 51, 300])
        return f"filterSeries({_series(rng, depth - 1)}, '{func}', '{op}', {t})"
    if name == "smartSummarize":
        how = rng.choice(["sum", "max", "min", "last", "avg"])
        return (f"smartSummarize({_series(rng, depth - 1)}, "
                f"{rng.randint(1, 8)}, '{how}')")
    if name == "asPercentTotal":
        return f"asPercent({_series(rng, depth - 1)})"
    if name == "divideSeriesLists":
        a = _series(rng, depth - 1)
        b = _series(rng, depth - 1)
        return f"divideSeriesLists({a}, {b})"
    if name == "aggregateSeriesLists":
        a = _series(rng, depth - 1)
        b = _series(rng, depth - 1)
        how = rng.choice(["sum", "diff", "multiply"])
        return f"aggregateSeriesLists({a}, {b}, '{how}')"
    if name == "seriesListsSugar":
        a = _series(rng, depth - 1)
        b = _series(rng, depth - 1)
        return f"{rng.choice(['sumSeriesLists', 'diffSeriesLists', 'multiplySeriesLists'])}({a}, {b})"
    if name == "unique":
        k = rng.randint(1, 3)
        parts = [_series(rng, depth - 1) for _ in range(k)]
        return "unique(" + ", ".join(parts) + ")"
    if name == "groupByNodes":
        how = rng.choice(["sum", "max", "min", "avg"])
        k = rng.randint(1, 2)
        idxs = ", ".join(str(rng.randint(0, 1)) for _ in range(k))
        return (f"groupByNodes({_series(rng, depth - 1)}, '{how}', {idxs})")
    if name == "aliasByMetric":
        return f"aliasByMetric({_series(rng, depth - 1)})"
    if name == "applyByNode":
        tpl = rng.choice([
            "asPercent(%)", "asPercent(%, sumSeries(%))",
            "sumSeries(%)", "averageSeries(%)", "maxSeries(%)",
            "minSeries(%)", "divideSeries(%, maxSeries(%))",
            "divideSeries(%, averageSeries(%))",
            "divideSeries(%, sumSeries(%))",
        ])
        return (f"applyByNode({_series(rng, depth - 1)}, "
                f"{rng.randint(0, 1)}, '{tpl}')")
    if name == "cactiStyle":
        return f"cactiStyle({_series(rng, depth - 1)})"
    if name == "legendValue":
        keys = rng.sample(["avg", "total", "min", "max", "last"],
                          rng.randint(1, 2))
        args = ", ".join(f"'{k}'" for k in keys)
        return f"legendValue({_series(rng, depth - 1)}, {args})"
    if name == "summarizeXff":
        how = rng.choice(["sum", "max", "min", "last", "avg"])
        return (f"summarize(setXFilesFactor({_series(rng, depth - 1)}, "
                f"{rng.choice([25, 50, 75, 100])}), "
                f"{rng.randint(1, 8)}, '{how}')")
    if name == "aggregate":
        how = rng.choice(["sum", "average", "max", "min", "count",
                          "range", "stddev", "median"])
        return f"aggregate({_series(rng, depth - 1)}, '{how}')"
    if name == "movingWindow":
        how = rng.choice(["sum", "average", "min", "max", "median"])
        return (f"movingWindow({_series(rng, depth - 1)}, "
                f"{rng.randint(1, 6)}, '{how}')")
    if name == "highestLowest":
        hl = rng.choice(["highest", "lowest"])
        how = rng.choice(["average", "current"] + (
            ["max"] if hl == "highest" else []))
        return f"{hl}({_series(rng, depth - 1)}, {rng.randint(1, 4)}, '{how}')"
    if name == "add":
        return f"add({_series(rng, depth - 1)}, {rng.randint(-3, 5)})"
    if name == "group":
        k = rng.randint(2, 3)
        parts = [_series(rng, depth - 1) for _ in range(k)]
        return "group(" + ", ".join(parts) + ")"
    # binary combiners need single-series sides: force reductions
    a = _series(rng, depth - 1)
    b = _series(rng, depth - 1)
    return f"{name}(sumSeries({a}), sumSeries({b}))"


def test_render_fuzz_spark_equals_duckdb(spark, sf_dir):
    rng = random.Random(20260814)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    checked = rejected = 0
    while checked < 30:
        target = _series(rng, rng.randint(1, 4))
        node = parse_target(target)  # must round-trip the parser
        try:
            validate_target(node)
        except RenderParseError:
            rejected += 1
            assert rejected < 400, "analyzer rejects nearly everything"
            continue
        got = Counter(
            (r.metric, r.interval, r.value)
            for r in render(spark, sf_dir, target).collect()
        )
        want = Counter()
        for m, iv, v in con.execute(render_oracle_sql(target)).fetchall():
            if v is not None and isinstance(v, float) and math.isnan(v):
                v = None
            want[(m, iv, v)] += 1
        assert got == want, f"divergence on {target!r}"
        checked += 1
    assert checked == 30


def test_render_fuzz_sort_roots(spark, sf_dir):
    """Root-only ordering ops: wrap drawn targets in sortByTotal /
    sortByMaxima / sortByName and compare the 4-tuple INCLUDING the
    series_rank column (the ordering contract itself); also pin that
    a non-root placement is rejected by both visitors via
    validate_target."""
    rng = random.Random(20260815)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    checked = rejected = 0
    while checked < 6:
        sort = rng.choice(["sortByTotal", "sortByMaxima", "sortByName",
                           "sortByMinima", "sortBy"])
        if sort == "sortBy":
            func = rng.choice(["max", "min", "sum", "average", "current"])
            target = (f"sortBy({_series(rng, rng.randint(1, 3))}, "
                      f"'{func}', {rng.randint(0, 1)})")
        else:
            target = f"{sort}({_series(rng, rng.randint(1, 3))})"
        node = parse_target(target)
        try:
            validate_target(node)
        except RenderParseError:
            rejected += 1
            assert rejected < 200
            continue
        got = Counter(
            (r.metric, r.interval, r.value, r.series_rank)
            for r in render(spark, sf_dir, target).collect()
        )
        want = Counter()
        for m, iv, v, rk in con.execute(render_oracle_sql(target)).fetchall():
            if v is not None and isinstance(v, float) and math.isnan(v):
                v = None
            want[(m, iv, v, rk)] += 1
        assert got == want, f"divergence on {target!r}"
        checked += 1

    # non-root placement rejected identically before either engine runs
    for bad in ("scale(sortByTotal('*'), 2)",
                "sumSeries(sortByName('c*'))"):
        try:
            validate_target(parse_target(bad))
            raise AssertionError(f"accepted non-root sort: {bad}")
        except RenderParseError:
            pass
