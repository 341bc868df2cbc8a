"""Fixture invariants the byte-arithmetic oracles LEAN ON.

The multimodal oracles (m_decode_stats, m_resize_stats, m_pcm_energy,
m_feature_norms) restate payload bytes from `documents.text` via
DuckDB's `unicode(c)` — valid iff every document is pure ASCII (byte
value == code point, strlen == byte length).  Empty payloads are
guarded inside the oracles themselves; the ASCII premise was only a
comment until this test (round-7 ADVICE asked for exactly this class
of fixture-level assertion).  Checked at every scale factor the gates
use, via DuckDB directly — no Spark session needed.
"""

import os

import duckdb
import pytest

SFS = [d for d in ("sf0.001", "sf0.01", "sf0.1")
       if os.path.exists(f"/root/testdata/{d}/documents.parquet")]


@pytest.mark.parametrize("sf", SFS)
def test_documents_nonempty_ascii(sf):
    con = duckdb.connect()
    n_bad, n_empty, n_null = con.execute(
        f"""
        SELECT count(*) FILTER (WHERE regexp_matches(text, '[^\\x01-\\x7f]')),
               count(*) FILTER (WHERE strlen(text) = 0),
               count(*) FILTER (WHERE text IS NULL)
        FROM read_parquet('/root/testdata/{sf}/documents.parquet')
        """
    ).fetchone()
    assert n_bad == 0, f"{sf}: {n_bad} documents contain non-ASCII bytes"
    assert n_empty == 0, f"{sf}: {n_empty} documents are empty"
    assert n_null == 0, f"{sf}: {n_null} documents have NULL text"


@pytest.mark.parametrize("sf", SFS)
def test_embeddings_dim_and_no_nulls(sf):
    """The cosine/ANN/matryoshka oracles index v[1..64] positionally."""
    con = duckdb.connect()
    bad = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('/root/testdata/{sf}/embeddings.parquet')
        WHERE len(embedding) != 64
           OR len(list_filter(embedding, x -> x IS NULL)) > 0
        """
    ).fetchone()[0]
    assert bad == 0, f"{sf}: {bad} embeddings are not 64-dim non-null"
