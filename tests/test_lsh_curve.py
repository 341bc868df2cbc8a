"""The hyperplane-table-count curve's construction laws.

The s_labelprop_lsh_mt{,2,8} rungs claim a MONOTONE curve because
their table sets are prefixes of one PRNG stream — these tests pin
the two facts that claim rests on: (1) the stream's first 4 tables
are bitwise the pre-curve MT_HYPERPLANES (so extending to 8 did not
move the shipped 4-table rung), and (2) candidate edge sets nest
across the prefix (edges(2) ⊆ edges(4) ⊆ edges(8)), which makes
pair agreement monotone in T (more edges only merge LSH clusters,
each still a refinement of the exact clustering).
"""

import random

from go_whisper_spark.operators.llm_ops import (
    _MT_TABLES,
    _MT_TABLES_MAX,
    MT_HYPERPLANES,
    N_PLANES,
    _mt_lsh_pairs,
)


def test_mt_hyperplane_stream_prefix_stable():
    """Regenerating the ORIGINAL 4-table draw from the same seed must
    equal the extended stream's first 4 tables — the bitwise-prefix
    property that keeps the shipped 4-table rung's oracle byte-stable
    across the curve extension."""
    prng = random.Random(0xB0B5CA1E)
    first4 = [
        [[round(prng.gauss(0.0, 1.0), 8) for _ in range(64)]
         for _ in range(N_PLANES)]
        for _ in range(_MT_TABLES)
    ]
    assert MT_HYPERPLANES[:_MT_TABLES] == first4
    assert len(MT_HYPERPLANES) == _MT_TABLES_MAX


def test_mt_lsh_pairs_prefix_nested(spark, sf_dir):
    """edges(2) ⊆ edges(4) ⊆ edges(8): a pair bucketed together in
    any of the first T tables is bucketed together in any superset —
    the nesting that makes the curve's agree_ppm monotone in T."""
    sets = {}
    for t in (2, 4, 8):
        sets[t] = {(r["ida"], r["idb"])
                   for r in _mt_lsh_pairs(spark, sf_dir, t).collect()}
    assert sets[2] <= sets[4] <= sets[8]
    # strictness is data-dependent; at sf0.001 the extra tables do
    # recover extra verified pairs — if this ever regresses to
    # equality the curve rungs are measuring nothing
    assert len(sets[8]) > len(sets[2])


def test_labelprop_fixpoint_empty_frames(spark):
    """ADVICE r17: an empty node frame aggregates delta to NULL —
    the loop must treat that as the (trivial) fixpoint, not spin
    _LP_MAX_ROUNDS no-op rounds into a bogus non-convergence error."""
    from go_whisper_spark.operators.llm_ops import _labelprop_fixpoint

    nodes = spark.createDataFrame([], "node long")
    pairs = spark.createDataFrame([], "ida long, idb long")
    lab, iters = _labelprop_fixpoint(nodes, pairs)
    assert lab.count() == 0
    assert iters == 1


def test_multiprobe_sweep_monotone_and_pins_mt_curve(spark, sf_dir):
    """s_lsh_multiprobe's two axes are monotone by construction —
    radius-1 candidates contain radius-0's (the probe array's first
    element IS the native bucket) and T tables' contain T-1's (the
    OR over a prefix) — so n_cand / lsh_edges / recall_ppm must be
    non-decreasing along each axis; and its radius-0 rows must count
    EXACTLY the `_mt_lsh_pairs` verified edge sets (the
    m_ahash_multiprobe cross-rung consistency pin, which caught the
    mt4 docstring's stale sf0.01 edge count)."""
    from go_whisper_spark.operators.llm_ops import s_lsh_multiprobe

    rows = {(r["tables"], r["radius"]): r
            for r in s_lsh_multiprobe(spark, sf_dir).collect()}
    for col in ("n_cand", "lsh_edges", "recall_ppm"):
        for t in (1, 2, 4):
            assert rows[(t, 0)][col] <= rows[(t, 1)][col]
        for r in (0, 1):
            assert (rows[(1, r)][col] <= rows[(2, r)][col]
                    <= rows[(4, r)][col])
    for t in (2, 4):
        assert rows[(t, 0)]["lsh_edges"] == \
            _mt_lsh_pairs(spark, sf_dir, t).count()
