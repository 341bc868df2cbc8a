"""Property fuzz: random render expressions evaluated BOTH ways —
the Spark composition vs the AST-emitted DuckDB SQL — must agree
exactly (the cent discipline makes every composition integer-exact).
Deterministic seed; bounded depth; covers every operator in the
registry including binary combiners and aggregate reducers."""

import math
import random

import duckdb
import pytest

from go_whisper_spark.render import parse_target, render, render_oracle_sql

_GLOBS = ["'*'", "'c*'", "'[ve]*'", "'p?rchase'"]


def _series(rng, depth):
    """Random series expression; returns (text, single_series: bool)."""
    if depth <= 0:
        return rng.choice(_GLOBS), False
    name = rng.choice(
        [
            "scale", "offset", "absolute", "derivative", "movingSum",
            "movingAverage", "nonNegativeDerivative", "transformNull",
            "keepLastValue", "integral", "timeShift", "grep",
            "maximumAbove", "highestMax", "alias", "aliasSub",
            "sumSeries", "averageSeries", "countSeries", "summarize",
            "diffSeries", "divideSeries", "asPercent", "group",
            "exclude", "currentAbove", "averageAbove",
        ]
    )
    if name == "exclude":
        s, single = _series(rng, depth - 1)
        return f"exclude({s}, '{rng.choice(['^c', '^[ve]', 'q'])}')", single
    if name in ("currentAbove", "averageAbove"):
        s, single = _series(rng, depth - 1)
        return f"{name}({s}, {rng.choice([0, 40, 51, 300])})", single
    if name == "summarize":
        s, single = _series(rng, depth - 1)
        how = rng.choice(["sum", "max", "min", "last", "avg"])
        return f"summarize({s}, {rng.randint(1, 8)}, '{how}')", single
    if name in ("scale", "offset", "timeShift"):
        s, single = _series(rng, depth - 1)
        return f"{name}({s}, {rng.randint(-3, 5)})", single
    if name in ("movingSum", "movingAverage"):
        s, single = _series(rng, depth - 1)
        return f"{name}({s}, {rng.randint(1, 6)})", single
    if name in ("absolute", "derivative", "nonNegativeDerivative",
                "keepLastValue", "integral"):
        s, single = _series(rng, depth - 1)
        return f"{name}({s})", single
    if name == "transformNull":
        s, single = _series(rng, depth - 1)
        return f"{name}({s}, {rng.randint(-2, 2)})", single
    if name == "grep":
        s, single = _series(rng, depth - 1)
        pat = rng.choice(["^(c|v)", "^[es]", "r"])
        return f"grep({s}, '{pat}')", single
    if name == "maximumAbove":
        s, single = _series(rng, depth - 1)
        return f"maximumAbove({s}, {rng.choice([50, 300, 360])})", single
    if name == "highestMax":
        s, single = _series(rng, depth - 1)
        return f"highestMax({s}, {rng.randint(1, 4)})", single
    if name == "alias":
        s, _ = _series(rng, depth - 1)
        return f"alias({s}, 'a{rng.randint(0, 9)}')", False
    if name == "aliasSub":
        s, single = _series(rng, depth - 1)
        return f"aliasSub({s}, '^c', 'K')", single
    if name in ("sumSeries", "averageSeries", "countSeries"):
        s, _ = _series(rng, depth - 1)
        return f"{name}({s})", True
    if name == "group":
        k = rng.randint(2, 3)
        parts = [_series(rng, depth - 1)[0] for _ in range(k)]
        return "group(" + ", ".join(parts) + ")", False
    # binary combiners need single-series sides: force reductions
    a, _ = _series(rng, depth - 1)
    b, _ = _series(rng, depth - 1)
    return f"{name}(sumSeries({a}), sumSeries({b}))", True


def test_render_fuzz_spark_equals_duckdb(spark, sf_dir):
    rng = random.Random(20260814)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    checked = 0
    for _ in range(25):
        target, _ = _series(rng, rng.randint(1, 3))
        parse_target(target)  # must round-trip the parser
        got = {
            (r.metric, r.interval, r.value)
            for r in render(spark, sf_dir, target).collect()
        }
        want = set()
        for m, iv, v in con.execute(render_oracle_sql(target)).fetchall():
            if v is not None and isinstance(v, float) and math.isnan(v):
                v = None
            want.add((m, iv, v))
        assert got == want, f"divergence on {target!r}"
        checked += 1
    assert checked == 25
