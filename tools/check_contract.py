"""Local stand-in for the driver's correctness gate — EXACT-MATCH.

Runs entry() as a smoke check, then every queries() entry against its
oracle_sql() via DuckDB: row-count + column-name/schema + an exact,
TYPED value comparison that mirrors the driver's hash semantics:

- oracle rows come from ``fetchdf()`` (pandas materialization) read
  COLUMN-WISE, so a DuckDB HUGEINT sum shows up as float64 — exactly
  as the driver sees it (round-1 evidence: BIGINT columns stayed int
  and passed, HUGEINT sums became ``1085.0`` and hash-failed; arrow
  would give Decimal, which does NOT match the driver).  An uncast
  ``sum(INTEGER)`` therefore fails HERE, locally, the same way it
  fails the driver.  Corollary: a nullable BIGINT oracle column also
  becomes float64 (5.0/NaN) — avoid nullable-int output columns, or
  cast BOTH sides to DOUBLE.
- no float tolerance: values compare bit-exact, and int != float even
  when numerically equal (1085 != 1085.0).
- NaN normalizes to None on BOTH sides (round-1 evidence: driver-green
  queries emit SQL NULL in double columns, which pandas/arrow may
  surface as NaN — the driver treats them as equal).
- numpy scalars / pd.Timestamp normalize to their Python equivalents
  before the typed compare; arrays compare element-wise typed.
  NEVER materialize oracle rows via ``iterrows()`` — pandas row
  Series upcast mixed int/float rows to float64, corrupting the very
  types this gate exists to check.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

def norm_cell(v):
    """Normalize one cell to a canonical typed Python value.

    Applied identically to Spark rows and DuckDB/arrow rows.  Keeps
    the int-vs-float distinction (the driver's hash is typed), maps
    NaN to None on both sides, and unwraps numpy/pandas scalar types.
    """
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return bool(v)
    if isinstance(v, (int, np.integer)):
        return int(v)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return None if math.isnan(f) else f
    if isinstance(v, decimal.Decimal):
        return v
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    if isinstance(v, np.ndarray):
        return tuple(norm_cell(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, datetime.datetime):
        return v
    return v


def cells_equal(va, vb):
    if type(va) is not type(vb):
        return False
    if isinstance(va, tuple):
        return len(va) == len(vb) and all(
            cells_equal(x, y) for x, y in zip(va, vb)
        )
    return va == vb


def rows_match(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            if not cells_equal(va, vb):
                return False
    return True


def sort_key(row):
    return tuple(
        (v is None, str(type(v)), str(v)) for v in row
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from go_whisper_spark.session import get_spark

    spark = get_spark("check_contract")
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    smoke = e.entry(spark)
    n = smoke.count()
    print(f"entry(): {n} rows, schema={smoke.columns} [{time.time()-t0:.1f}s]")
    assert n > 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [
                tuple(norm_cell(r[c]) for c in scols)
                for r in sdf.select(*scols).collect()
            ]
            srows.sort(key=sort_key)
            if name not in oracles:
                print(f"  {name}: rows-only, {len(srows)} rows [{time.time()-t0:.1f}s]")
                continue
            ddf = con.execute(oracles[name]).fetchdf()
            dcols = sorted(ddf.columns.tolist())
            coldata = {c: ddf[c].tolist() for c in dcols}
            drows = [
                tuple(norm_cell(coldata[c][i]) for c in dcols)
                for i in range(len(ddf))
            ]
            drows.sort(key=sort_key)
            ok_cols = scols == dcols
            ok_rows = rows_match(srows, drows)
            status = "OK" if (ok_cols and ok_rows) else "MISMATCH"
            print(
                f"  {name}: {status} spark={len(srows)} duckdb={len(drows)} "
                f"cols={'=' if ok_cols else f'{scols} vs {dcols}'} [{time.time()-t0:.1f}s]"
            )
            if not (ok_cols and ok_rows):
                failed.append(name)
                for i, (ra, rb) in enumerate(zip(srows, drows)):
                    if not rows_match([ra], [rb]):
                        print(f"    first diff row {i}: spark={ra} duckdb={rb}")
                        break
                if len(srows) != len(drows):
                    sa, sb = set(srows), set(drows)
                    print(f"    only-spark sample: {list(sa - sb)[:2]}")
                    print(f"    only-duckdb sample: {list(sb - sa)[:2]}")
        except Exception as ex:
            failed.append(name)
            print(f"  {name}: ERROR {type(ex).__name__}: {ex}")
    print("FAILED:" if failed else "ALL OK", failed if failed else "")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
