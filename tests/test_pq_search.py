"""Quality gates for the composed PQ-IVF read path (s_pq_search).

The composed IVF-route → ADC-scan → exact-rerank path must recover at
least as much of the exact top-3 as the raw ADC-over-everything
measurement (s_pq_recall): the rerank tier exists to claw back ADC
ordering loss, so if the composition ever dips BELOW the code-level
floor, the routing or rerank wiring is broken.  (Absolute recall is
low on this corpus by construction — random embeddings are the
adversarial case for 12-bit codes; the honest ladder is documented at
llm_ops.py PQS_RERANK.)
"""

from pyspark.sql import functions as F


def _mean_recall(df):
    return df.agg(F.avg("recall3").alias("r")).first()["r"]


def test_composed_path_beats_adc_floor(spark, sf_dir):
    from go_whisper_spark.operators.llm_ops import s_pq_recall, s_pq_search_recall

    adc_floor = _mean_recall(s_pq_recall(spark, sf_dir))
    composed = _mean_recall(s_pq_search_recall(spark, sf_dir))
    assert composed >= adc_floor, (
        f"composed IVF+ADC+rerank recall {composed} fell below the "
        f"ADC-only floor {adc_floor}"
    )


def test_search_shape_and_rerank_exactness(spark, sf_dir):
    """Every emitted neighbor carries its EXACT cosine (rerank output,
    not the ADC approximation): re-score one query's results against
    the brute-force sims."""
    from go_whisper_spark.operators.llm_ops import _brute_topk, s_pq_search

    res = s_pq_search(spark, sf_dir)
    rows = res.collect()
    assert {len([r for r in rows if r.qid == q]) for q in {r.qid for r in rows}} == {3}
    exact = {
        (r.qid, r.neighbor): r.sim
        for r in _brute_topk(spark, sf_dir, 50, 10**9).collect()
    }
    for r in rows:
        if (r.qid, r.neighbor) in exact:
            assert r.sim == exact[(r.qid, r.neighbor)]


def test_upserted_serve_recall_floor(spark, sf_dir):
    """The upsert → serve loop (frozen base-trained quantizers, union
    corpus encoded against them) must stay within the drift budget:
    recall@3 ≥ the ADC-only floor, and within 0.15 absolute of the
    fresh-retrain composed path — the quality trade the
    frozen-codebook lifecycle knowingly accepts (s_pq_upsert's drift
    ledger is the monitoring signal for exactly this number)."""
    from go_whisper_spark.operators.llm_ops import (
        s_pq_recall,
        s_pq_search_recall,
        s_pq_upserted_recall,
    )

    adc_floor = _mean_recall(s_pq_recall(spark, sf_dir))
    fresh = _mean_recall(s_pq_search_recall(spark, sf_dir))
    upserted = _mean_recall(s_pq_upserted_recall(spark, sf_dir))
    assert upserted >= adc_floor, (
        f"post-upsert recall {upserted} fell below the ADC floor {adc_floor}"
    )
    assert upserted >= fresh - 0.15, (
        f"frozen-codebook drift too large: upserted {upserted} vs "
        f"fresh retrain {fresh}"
    )


def test_filtered_search_respects_predicate(spark, sf_dir):
    """Every neighbor served by the filtered read path satisfies the
    metadata predicate, and results equal the unfiltered path with
    odd-label neighbors excluded at the CANDIDATE stage (pre-filter),
    not post-truncated from the unfiltered top-3."""
    from go_whisper_spark.operators.llm_ops import (
        _emb,
        s_pq_search,
        s_pq_search_filtered,
    )

    got = s_pq_search_filtered(spark, sf_dir)
    labels = {
        r["vec_id"]: r["label"]
        for r in _emb(spark, sf_dir).select("vec_id", "label").collect()
    }
    rows = got.collect()
    assert rows, "filtered search returned nothing"
    assert all(labels[r["neighbor"]] % 2 == 0 for r in rows)
    # pre-filter ≠ post-filter: at least one query must surface an
    # even-label neighbor that the unfiltered top-3 truncation would
    # have dropped (if this never happens the predicate was a no-op).
    unfiltered = {
        (r["qid"], r["neighbor"]) for r in s_pq_search(spark, sf_dir).collect()
    }
    assert any((r["qid"], r["neighbor"]) not in unfiltered for r in rows)


def test_multiprobe_rung_lifts_recall(spark, sf_dir):
    """The multi-probe serve rung (4 probes + 40-candidate rerank)
    must buy STRICTLY more recall than the 2-probe rung — the whole
    point of the knob (VERDICT r11 item 5; measured 0.327 -> 0.473 at
    sf0.01, 0.200 -> 0.293 at sf0.1).  Widening the route without the
    pool measurably LOWERED recall, so this floor also guards the
    paired-knob contract."""
    from go_whisper_spark.operators.llm_ops import (
        s_pq_mp_recall,
        s_pq_search_recall,
    )

    single = _mean_recall(s_pq_search_recall(spark, sf_dir))
    multi = _mean_recall(s_pq_mp_recall(spark, sf_dir))
    assert multi > single, (
        f"multi-probe recall {multi} did not lift above the "
        f"2-probe rung {single}"
    )
