"""Physical-plan introspection helpers.

The engine has no custom Catalyst rules (SURVEY.md §4) — its plan
guarantees are *shapes* the built-in optimizer must produce: pushed
filters, pruned read schemas, broadcast dim joins, partial aggregates,
partition pruning, reused exchanges.  These helpers make those shapes
assertable in tests and auditable from ``tools/plan_audit.py`` so a
regression (e.g. a join silently degrading to cartesian, a scan reading
all columns) fails loudly instead of shipping as a 100 TB surprise.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain output as a string (what ``df.explain``
    prints), usable for assertions."""
    qe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    return qe.explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def final_plan(df: DataFrame) -> str:
    """The *executed* adaptive plan: runs THIS DataFrame's own
    QueryExecution via ``collect()`` (cheap at audit scale), so AQE
    finalizes every stage and codegen wrapping becomes visible.
    Pitfalls this dodges: the pre-execution adaptive plan hides
    codegen (isFinalPlan=false), and ``df.count()`` executes a
    *different* QueryExecution, leaving this one un-finalized."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_spans(df: DataFrame) -> int:
    """Distinct whole-stage-codegen span ids in the executed plan —
    the ``*(n)`` operator markers (toString spelling; explain
    "formatted" spells the same spans "WholeStageCodegen (n)")."""
    text = final_plan(df)
    return len(
        set(re.findall(r"\*\((\d+)\)", text))
        | set(re.findall(r"WholeStageCodegen \((\d+)\)", text))
    )


def read_schema_width(plan: str) -> Optional[int]:
    """Number of columns in the first parquet ReadSchema of the plan."""
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    return m.group(1).count(":") if m else None


def assert_plan(
    df: DataFrame,
    require: Iterable[str] = (),
    forbid: Iterable[str] = (),
    max_scan_columns: Optional[int] = None,
) -> str:
    """Assert plan shape; returns the plan text on success."""
    plan = explain_formatted(df)
    problems = []
    for r in require:
        if r not in plan:
            problems.append(f"missing: {r}")
    for f in forbid:
        if f in plan:
            problems.append(f"forbidden present: {f}")
    if max_scan_columns is not None:
        width = read_schema_width(plan)
        if width is not None and width > max_scan_columns:
            problems.append(f"scan reads {width} cols > {max_scan_columns}")
    if problems:
        raise AssertionError("plan shape violations: " + "; ".join(problems) + "\n" + plan)
    return plan
