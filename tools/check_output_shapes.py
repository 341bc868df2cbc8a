"""Driver-contract output-shape guard — SCALAR COLUMNS ONLY.

The driver's correctness harness canonicalizes each result via pandas
``sort_values`` over every output column before hashing; a top-level
list/struct/map column raises ``TypeError: unhashable type`` inside
pandas and the row records ``err`` with no comparison at all (round-12
evidence: ``s_kmeans_step``'s ``centroid ARRAY<BIGINT>`` was the single
red row among 327 — the math was exact, the SHAPE was illegal).  The
repo's own ``check_contract`` compares arrays element-wise, so it is
strictly SOFTER than the driver here and cannot catch the class.

This guard closes it at registration time: DuckDB ``DESCRIBE`` over
every ``oracle_sql()`` entry (schema inference only — no data is
scanned, the whole registry sweeps in seconds), failing on any
top-level column whose declared type is a list (``...[]``), STRUCT,
MAP, UNION, or JSON.  Nested use INSIDE a query is fine and common
(min-struct argmax, list_transform); only the OUTPUT projection must
be scalar.

Runs standalone (``python tools/check_output_shapes.py [sf_dir]``)
and from pytest (tests/test_counts.py) — both exit non-zero /
fail on the first offender.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

# single source of truth for the table list — keeps the two gates in
# lockstep when a source table is added or relaid
from tools.check_contract import TABLES

# A column type is non-scalar if it is a list (trailing []), or a
# nested/semi-structured container.  DuckDB spells list types with a
# trailing "[]" (also "[4]" for fixed arrays), and containers as
# STRUCT(...), MAP(...), UNION(...), JSON.
_NON_SCALAR = re.compile(r"(\[\d*\]$|^STRUCT\b|^MAP\b|^UNION\b|^JSON\b)", re.I)


def non_scalar_columns(con: duckdb.DuckDBPyConnection, sql: str):
    """(name, type) pairs of top-level non-scalar columns of ``sql``."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        (name, typ)
        for name, typ, *_ in desc
        if _NON_SCALAR.search(typ.strip())
    ]


def connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as entry

    oracles = entry.oracle_sql()
    con = connect(sf_dir)
    bad = 0
    for name, sql in oracles.items():
        try:
            offenders = non_scalar_columns(con, sql)
        except Exception as e:  # DESCRIBE itself failing is also red
            print(f"  {name}: DESCRIBE ERROR {e}")
            bad += 1
            continue
        if offenders:
            print(f"  {name}: NON-SCALAR output {offenders}")
            bad += 1
    print(f"{len(oracles)} oracles described, {bad} with non-scalar output")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
