"""Golden-model test for the exact-substring span remover
(t_span_dedup): recompute the whole transform in pure Python on the
sf0.001 corpus (500 docs / ~28k tokens) and compare every document's
cleaned text bit-for-bit.  The oracle-gate cross-checks DuckDB; this
pins the SEMANTICS against an independent third implementation, so an
error that happened to be expressed identically in both SQL dialects
can't hide."""

import re


def _clean_corpus(rows):
    """rows: [(doc_id, text)] → {doc_id: (n_tok, n_removed, clean)}"""
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in rows}
    first = {}
    for d in sorted(toks):
        tt = toks[d]
        for i in range(len(tt) - 2):
            sh = " ".join(tt[i : i + 3])
            first.setdefault(sh, (d, i))
    out = {}
    for d, tt in toks.items():
        covered = set()
        for i in range(len(tt) - 2):
            sh = " ".join(tt[i : i + 3])
            if first[sh] != (d, i):
                covered.update((i, i + 1, i + 2))
        kept = [t for i, t in enumerate(tt) if i not in covered]
        out[d] = (len(tt), len(tt) - len(kept), " ".join(kept))
    return out


def test_span_dedup_matches_python_model(spark, sf_dir):
    from go_whisper_spark.operators.llm_ops import _docs, t_span_dedup

    rows = [
        (r.doc_id, r.text)
        for r in _docs(spark, sf_dir).select("doc_id", "text").collect()
    ]
    want = _clean_corpus(rows)
    got = {
        r.doc_id: (r.n_tok, r.n_removed, r.clean_text)
        for r in t_span_dedup(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert got[d] == want[d], f"doc {d}: {got[d][:2]} != {want[d][:2]}"


def test_span_dedup_keeps_first_occurrence(spark, sf_dir):
    """Every removed token must be part of some repeated 3-gram, and
    the corpus must still contain at least one copy of every shingle
    (first occurrences survive unless clipped by OVERLAPPING repeats
    — so check the weaker, always-true direction: docs with zero
    duplicated spans are emitted verbatim)."""
    from pyspark.sql import functions as F

    from go_whisper_spark.operators.llm_ops import t_dup_spans, t_span_dedup

    spans = {r.doc_id: r.n_dup_spans for r in t_dup_spans(spark, sf_dir).collect()}
    for r in t_span_dedup(spark, sf_dir).collect():
        if spans.get(r.doc_id, 0) == 0:
            assert r.n_removed == 0


def _clean_corpus_min_len(rows, min_len):
    """Maximal-run model: duplicate 3-gram positions chain when <= 3
    apart (their coverage overlaps/abuts); a merged run is excised
    only when its total covered length >= min_len tokens."""
    toks = {d: re.findall(r"[a-z0-9]+", t.lower()) for d, t in rows}
    first = {}
    for d in sorted(toks):
        tt = toks[d]
        for i in range(len(tt) - 2):
            sh = " ".join(tt[i : i + 3])
            first.setdefault(sh, (d, i))
    out = {}
    for d, tt in toks.items():
        dups = [
            i
            for i in range(len(tt) - 2)
            if first[" ".join(tt[i : i + 3])] != (d, i)
        ]
        covered = set()
        run = []
        for i in dups + [None]:
            if run and (i is None or i - run[-1] > 3):
                s, e = run[0], run[-1] + 2
                if e - s + 1 >= min_len:
                    covered.update(range(s, e + 1))
                run = []
            if i is not None:
                run.append(i)
        kept = [t for i, t in enumerate(tt) if i not in covered]
        out[d] = (len(tt), len(tt) - len(kept), " ".join(kept))
    return out


def test_span_dedup_min_len_matches_python_model(spark, sf_dir):
    """Both length gates pinned against the pure-Python maximal-run
    model, cleaned text bit-for-bit."""
    from go_whisper_spark.operators.llm_ops import (
        _docs,
        t_span_dedup_l5,
        t_span_dedup_l9,
    )

    rows = [
        (r.doc_id, r.text)
        for r in _docs(spark, sf_dir).select("doc_id", "text").collect()
    ]
    for min_len, fn in ((5, t_span_dedup_l5), (9, t_span_dedup_l9)):
        want = _clean_corpus_min_len(rows, min_len)
        got = {
            r.doc_id: (r.n_tok, r.n_removed, r.clean_text)
            for r in fn(spark, sf_dir).collect()
        }
        assert got == want, f"min_len={min_len}"


def test_span_dedup_min_len_3_equals_fixed_k(spark, sf_dir):
    """At min_len=3 every maximal run qualifies, so the coverage —
    and therefore the cleaned corpus — must equal t_span_dedup's
    fixed-k form exactly (the runs are just a regrouping of the same
    dup positions)."""
    from go_whisper_spark.operators.llm_ops import (
        _t_span_dedup_min_len,
        t_span_dedup,
    )

    base = {
        r.doc_id: (r.n_tok, r.n_removed, r.clean_text)
        for r in t_span_dedup(spark, sf_dir).collect()
    }
    l3 = {
        r.doc_id: (r.n_tok, r.n_removed, r.clean_text)
        for r in _t_span_dedup_min_len(spark, sf_dir, 3).collect()
    }
    assert base == l3


def test_span_dedup_length_gate_is_monotone(spark, sf_dir):
    """A stricter length gate removes a subset: per-doc n_removed at
    L=9 <= at L=5 <= fixed-k, and the gates genuinely discriminate on
    this corpus (strict somewhere)."""
    from go_whisper_spark.operators.llm_ops import (
        t_span_dedup,
        t_span_dedup_l5,
        t_span_dedup_l9,
    )

    r0 = {r.doc_id: r.n_removed for r in t_span_dedup(spark, sf_dir).collect()}
    r5 = {r.doc_id: r.n_removed for r in t_span_dedup_l5(spark, sf_dir).collect()}
    r9 = {r.doc_id: r.n_removed for r in t_span_dedup_l9(spark, sf_dir).collect()}
    assert all(r9[d] <= r5[d] <= r0[d] for d in r0)
    assert sum(r9.values()) < sum(r5.values()) < sum(r0.values())
