"""Local stand-in for the driver's correctness gate.

Runs entry() as a smoke check, then every queries() entry at sf0.01
against its oracle_sql() via DuckDB: row-count + column-name/schema +
order-insensitive value comparison (sorted columns by name, rows
sorted, NULL-safe, doubles compared to 1e-9 rel tolerance — stricter
in spirit than a hash so mismatches print a diff sample).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def rows_match(a, b):
    if len(a) != len(b):
        return False
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for va, vb in zip(ra, rb):
            va, vb = norm_cell(va), norm_cell(vb)
            if isinstance(va, float) and isinstance(vb, float):
                if not math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9):
                    return False
            elif va != vb:
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
                tuple(r[c] for c in scols)
                for r in sdf.select(*scols).collect()
            ]
            srows.sort(key=sort_key)
            if name not in oracles:
                print(f"  {name}: rows-only, {len(srows)} rows [{time.time()-t0:.1f}s]")
                continue
            ddf = con.execute(oracles[name]).fetchdf()
            dcols = sorted(ddf.columns.tolist())
            drows = [tuple(row[c] for c in dcols) for _, row in ddf.iterrows()]
            drows = [
                tuple(None if (isinstance(v, float) and math.isnan(v)) else v for v in r)
                for r in drows
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
