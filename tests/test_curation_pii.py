"""The curation capstone's scrub-before-train order pin.

t_curation_pii claims the stage order (dedup -> scrub -> LM gate) is
observable in its ledger.  Per-lang COUNTS cannot show it (ntile(3)
sizes depend only on how many docs are scored), so the observable is
tail MEMBERSHIP: the LM trained on scrubbed text ranks held-out docs
differently than the raw-text LM, moving docs across the tercile
boundary — which moves bytes_kept and therefore the oracle hash.
This test pins that the two gates disagree on real data (if they ever
collapse to equality, the order pin is vacuous and the rung needs a
sharper fixture).
"""

from pyspark.sql import functions as F

from go_whisper_spark.operators.llm_ops import (
    TOKEN_RE,
    _curation_gate,
    _docs,
    _pii_aug_col,
    _pii_red_col,
    _tokens_col,
    d_cdc_neardup,
)


def test_scrubbed_lm_gate_differs_from_raw(spark, sf_dir):
    pairs = d_cdc_neardup(spark, sf_dir)
    dropped = (pairs.select(F.col("doc_b").alias("doc_id")).distinct()
               .localCheckpoint())
    d_raw = (
        _docs(spark, sf_dir)
        .withColumn("tokens", _tokens_col())
        .withColumn("nb", F.length("text"))
        .join(dropped.withColumn("dup", F.lit(1)), "doc_id", "left")
    )
    d_scr = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", _pii_aug_col().alias("aug"))
        .withColumn("scr", _pii_red_col(F.col("aug")))
        .select(
            "doc_id", "lang",
            F.regexp_extract_all(F.lower("scr"), F.lit(TOKEN_RE), F.lit(0))
            .alias("tokens"),
            F.length("scr").alias("nb"),
        )
        .join(dropped.withColumn("dup", F.lit(1)), "doc_id", "left")
    )
    t_raw = {r["doc_id"] for r in _curation_gate(d_raw)
             .where(F.col("tail") == 1).select("doc_id").collect()}
    t_scr = {r["doc_id"] for r in _curation_gate(d_scr)
             .where(F.col("tail") == 1).select("doc_id").collect()}
    # ntile keeps the SIZES equal...
    assert len(t_raw) == len(t_scr)
    # ...but training on scrubbed text must move the MEMBERSHIP —
    # the observable that makes the stage order auditable
    assert t_raw != t_scr


def test_luhn_gate_redacts_valid_keeps_near_miss(spark, monkeypatch):
    """The checksum gate's behavioral pin (VERDICT r18 item 7): in a
    SINGLE crafted document holding a Luhn-VALID card
    (4539-1488-0343-6467, the classic test number) and its +1
    NEAR-MISS (…6468), the scrub must redact exactly the valid one
    and leave the near-miss verbatim — the difference between a
    regex detector and a checksum-gated one.  A doc with no
    candidates exercises the sequence(1, 0) descending guard."""
    from go_whisper_spark.operators import llm_ops as lo

    crafted = spark.createDataFrame(
        [(1, "en", "pay 4539-1488-0343-6467 not 4539-1488-0343-6468 ok"),
         (2, "en", "no cards here"),
         (3, "de", "fail 1234-5678-9012-3456 only")],
        "doc_id long, lang string, text string",
    )
    monkeypatch.setattr(lo, "_docs", lambda *_: crafted)
    got = {r.lang: r for r in lo.t_pii_luhn(spark, "unused").collect()}
    en, de = got["en"], got["de"]
    assert (en.cards_found, en.cards_valid) == (2, 1)
    assert en.near_miss_kept == 1 and en.residual_valid == 0
    # '[CARD]' (6) replaces a 19-char match exactly once
    assert en.chars_removed == 19 - 6
    # 1234-5678-9012-3456 fails Luhn: found but untouched
    assert (de.cards_found, de.cards_valid) == (1, 0)
    assert de.near_miss_kept == 1 and de.chars_removed == 0
