"""Golden-model test for the BPE merge iteration (t_bpe_merge):
recompute the whole round in pure Python — best distinct-char pair by
(count DESC, pair ASC), GREEDY left-to-right merge per token, next
pair table over the merged symbols — and compare the top-20 exactly.

The operator implements the merge as a string replace, which equals
the greedy scan only because distinct-char pair occurrences cannot
overlap; this model runs the actual greedy scan, so if that
equivalence claim ever breaks (e.g. the restriction is lifted), this
test fails even while Spark and DuckDB still agree with each other."""

import re
from collections import Counter


def _greedy_merge(tok: str, best: str) -> list:
    syms, i = [], 0
    while i < len(tok):
        if tok[i : i + 2] == best:
            syms.append(best)
            i += 2
        else:
            syms.append(tok[i])
            i += 1
    return syms


def _python_model(texts):
    toks = [t for x in texts for t in re.findall(r"[a-z0-9]+", x.lower())]
    pairs = Counter(
        t[i : i + 2] for t in toks if len(t) >= 2 for i in range(len(t) - 1)
    )
    best = min(
        ((p, n) for p, n in pairs.items() if p[0] != p[1]),
        key=lambda kv: (-kv[1], kv[0]),
    )[0]
    new_pairs = Counter()
    for t in toks:
        syms = _greedy_merge(t, best)
        for i in range(len(syms) - 1):
            new_pairs[f"{syms[i]}+{syms[i + 1]}"] += 1
    top = sorted(new_pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    return best, top


def test_bpe_merge_matches_python_greedy(spark, sf_dir):
    from go_whisper_spark.operators.llm_ops import _docs, t_bpe_merge

    texts = [r.text for r in _docs(spark, sf_dir).select("text").collect()]
    _, want = _python_model(texts)
    got = [(r.pair, r.n) for r in t_bpe_merge(spark, sf_dir).collect()]
    assert got == want


def _greedy_merge_syms(syms, pair):
    """Greedy left-to-right non-overlap merge over SYMBOL sequences —
    the reference semantics for any pair, including self-pairs."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(syms[i] + syms[i + 1])
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _python_model_rounds(texts, rounds):
    """Multi-round trainer model: NO distinct-char restriction — best
    pair by (count DESC, (l, r) ASC), greedy merge, repeat."""
    toks = [
        list(t) for x in texts for t in re.findall(r"[a-z0-9]+", x.lower())
    ]
    for _ in range(rounds):
        pc = Counter(
            (s[i], s[i + 1]) for s in toks for i in range(len(s) - 1)
        )
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        toks = [_greedy_merge_syms(s, best) for s in toks]
    np_ = Counter(
        f"{s[i]}+{s[i + 1]}" for s in toks for i in range(len(s) - 1)
    )
    return sorted(np_.items(), key=lambda kv: (-kv[1], kv[0]))[:20]


def test_bpe_train2_matches_python_greedy(spark, sf_dir):
    from go_whisper_spark.operators.llm_ops import _docs, t_bpe_train2

    texts = [r.text for r in _docs(spark, sf_dir).select("text").collect()]
    want = _python_model_rounds(texts, 2)
    got = [(r.pair, r.n) for r in t_bpe_train2(spark, sf_dir).collect()]
    assert got == want


def test_bpe_merge_round_self_pair_is_greedy(spark):
    """The self-pair overlap case the old distinct-char restriction
    fenced off: best pair ('s','s') must merge greedily left-to-right
    — "ssss" twice, "sss" once — exactly like the Python reference."""
    from go_whisper_spark.operators.llm_ops import bpe_merge_round

    rows = [(list("ssss"),), (list("sss"),), (list("tss"),), (["t", "t"],)]
    toks = spark.createDataFrame(rows, "syms array<string>")
    # pair counts: (s,s) 3+2+1=6, (t,s) 1, (t,t) 1 → best = (s,s)
    got = sorted(tuple(r.syms) for r in bpe_merge_round(toks).collect())
    want = sorted(
        tuple(_greedy_merge_syms(list(s), ("s", "s")))
        for s in ("ssss", "sss", "tss", "tt")
    )
    assert got == want
    assert ("ss", "ss") in got and ("ss", "s") in got


def test_bpe_merge_round_merged_symbol_pairs(spark):
    """Round-2 shape: a pair whose LEFT side is a round-1 merge
    product ('ab') must match at full-symbol boundaries only — the
    'b' inside 'ab' can never pair as a standalone symbol."""
    from go_whisper_spark.operators.llm_ops import bpe_merge_round

    rows = [(["ab", "c", "x"],), (["ab", "c"],), (["a", "b", "c"],)]
    toks = spark.createDataFrame(rows, "syms array<string>")
    # (ab,c) appears twice — best; (a,b)/(b,c)/(c,x) once each
    got = sorted(tuple(r.syms) for r in bpe_merge_round(toks).collect())
    assert got == sorted(
        [("abc", "x"), ("abc",), ("a", "b", "c")]
    )


def test_bpe_train_vocab_matches_python_greedy(spark, sf_dir):
    """The 3-round merge table (round, pair, count) against the pure
    Python trainer model."""
    from go_whisper_spark.operators.llm_ops import _docs, t_bpe_train_vocab

    texts = [r.text for r in _docs(spark, sf_dir).select("text").collect()]
    toks = [
        list(t) for x in texts for t in re.findall(r"[a-z0-9]+", x.lower())
    ]
    want = []
    for rnd in range(1, 4):
        pc = Counter(
            (s[i], s[i + 1]) for s in toks for i in range(len(s) - 1)
        )
        best, n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((rnd, f"{best[0]}+{best[1]}", n))
        toks = [_greedy_merge_syms(s, best) for s in toks]
    got = [
        (r.merge_round, r.pair, r.n)
        for r in t_bpe_train_vocab(spark, sf_dir).collect()
    ]
    assert got == want


def test_bpe_encode_accounting(spark, sf_dir):
    """Per-doc encode ledger: symbol totals match the Python model,
    and the corpus-wide symbol drop equals the total number of merge
    applications (each application replaces two symbols with one)."""
    from go_whisper_spark.operators.llm_ops import _docs, t_bpe_encode

    texts = {
        r.doc_id: r.text
        for r in _docs(spark, sf_dir).select("doc_id", "text").collect()
    }
    # Python model: 2 global rounds over per-doc token lists.
    docs = {
        d: [list(t) for t in re.findall(r"[a-z0-9]+", x.lower())]
        for d, x in texts.items()
    }
    for _ in range(2):
        pc = Counter(
            (s[i], s[i + 1])
            for toks in docs.values()
            for s in toks
            for i in range(len(s) - 1)
        )
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        docs = {
            d: [_greedy_merge_syms(s, best) for s in toks]
            for d, toks in docs.items()
        }
    got = {
        r.doc_id: (r.n_tok, r.n_sym_chars, r.n_sym_merged)
        for r in t_bpe_encode(spark, sf_dir).collect()
    }
    for d, toks in docs.items():
        n_tok = len(toks)
        n_chars = sum(len(t) for t in re.findall(r"[a-z0-9]+", texts[d].lower()))
        n_merged = sum(len(s) for s in toks)
        assert got[d] == (n_tok, n_chars, n_merged), d
    total_drop = sum(c - m for _, c, m in got.values())
    assert total_drop > 0  # the merges actually landed somewhere
