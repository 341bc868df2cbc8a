"""Pytest-embedded oracle gate: a representative subset of the driver
contract compared against DuckDB at sf0.001 (the full gate lives in
tools/check_contract.py and runs all queries at sf0.01/sf0.1)."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SUBSET = [
    "w_lww_1h",
    "w_cascade_1d",
    "w_fetch_dense_3d",
    "w_sessionize_30m",
    "w_diff_series",
    "w_fill_merge",
    "r_q1_pricing",
    "r_exists_sql",
    "r_window_running",
    "d_lsh_pairs",
    "d_simhash_pairs",
    "s_cosine_topk",
    "t_tfidf_top3",
    "g_nonneg_derivative",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


def _key(row):
    return tuple((x is None, str(type(x)), str(x)) for x in row)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, sf_dir)
    cols = sorted(sdf.columns)
    srows = sorted(
        (tuple(_norm(r[c]) for c in cols) for r in sdf.select(*cols).collect()),
        key=_key,
    )
    ddf = duck.execute(oracles[name]).fetchdf()
    assert sorted(ddf.columns.tolist()) == cols
    drows = sorted(
        (
            tuple(_norm(row[c]) for c in cols)
            for _, row in ddf.iterrows()
        ),
        key=_key,
    )
    assert len(srows) == len(drows), f"{name}: row count"
    for ra, rb in zip(srows, drows):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                assert math.isclose(va, vb, rel_tol=1e-12, abs_tol=1e-12), (name, ra, rb)
            else:
                assert va == vb, (name, ra, rb)
