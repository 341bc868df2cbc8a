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
