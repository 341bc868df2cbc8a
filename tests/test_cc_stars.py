"""Large-star/small-star connected components (d_cc_stars).

The point of the operator is round complexity: min-label propagation
(d_neardup_clusters) needs diameter-many rounds — O(n) on a chain —
while star contraction converges in O(log² n) on any graph.  The chain
gate below is the scale argument, pinned as a test.
"""

import random

import pytest

from go_whisper_spark.operators.llm_ops import _star_contract, d_cc_stars, d_neardup_clusters

from tests.conftest import SF_DIR


def _labels_of(spark, edges):
    df = spark.createDataFrame(edges, "u: long, v: long")
    labels, rounds = _star_contract(df)
    return {r["doc_id"]: r["label"] for r in labels.collect()}, rounds


def test_chain_graph_logarithmic_rounds(spark):
    """Pathological chain 0-1-…-255: propagation would need ~256
    rounds; star contraction must land within 2·log2(n) = 16."""
    n = 256
    got, rounds = _labels_of(spark, [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}
    assert rounds <= 16, f"chain of {n} took {rounds} rounds"


def test_random_graph_matches_union_find(spark):
    rng = random.Random(0xC0FFEE)
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(60)]
    edges = [(u, v) for u, v in edges if u != v]

    parent = list(range(80))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    comp_min = {}
    touched = {x for e in edges for x in e}
    for x in touched:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    expected = {x: comp_min[find(x)] for x in touched}

    got, rounds = _labels_of(spark, edges)
    assert got == expected
    assert rounds <= 14


def test_single_edge_and_triangle(spark):
    got, _ = _labels_of(spark, [(7, 3)])
    assert got == {3: 3, 7: 3}
    got, _ = _labels_of(spark, [(1, 2), (2, 3), (3, 1), (9, 8)])
    assert got == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8}


def test_duplicate_and_reversed_edges_collapse(spark):
    """The same undirected edge in both orientations and repeated must
    not change the result (the canonical-orientation distinct)."""
    got, _ = _labels_of(spark, [(4, 5), (5, 4), (4, 5), (6, 5)])
    assert got == {4: 4, 5: 4, 6: 4}


def test_cc_stars_matches_propagation(spark):
    """Both implementations label the identical LSH edge set with the
    identical component minima (and thus sizes)."""
    a = sorted(map(tuple, d_cc_stars(spark, SF_DIR).collect()))
    b = sorted(map(tuple, d_neardup_clusters(spark, SF_DIR).collect()))
    assert a == b
    assert a, "expected at least one near-dup cluster at sf0.001"
