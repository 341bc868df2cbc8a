"""The df-cap skew fence for inverted-index pair generation
(VERDICT r11 item 6): the cap is the 100 TB scale argument for
`d_cdc_neardup` (and the documented refinement for every postings
join), so pin BOTH halves of it —

1. the BOUND: a deliberately hot key (df > cap) contributes ZERO
   candidate pairs, and the join's total output obeys the
   Σ df·(df−1)/2 bound over surviving keys;
2. the PLACEMENT: the cap's filter sits BELOW the self-join in the
   optimized plan (a cap applied after the join would bound nothing —
   the skewed shuffle would already have happened).
"""

from pyspark.sql import functions as F

from go_whisper_spark.operators.llm_ops import capped_posting_pairs

CAP = 5


def _postings(spark):
    # 20 docs all share the boilerplate key "HOT" (df=20 > cap=5);
    # docs 0-2 share rare key "r1" (df=3); docs 10-11 share "r2"
    # (df=2).  Without the fence the hot key alone makes 190 pairs.
    rows = [(d, "HOT") for d in range(20)]
    rows += [(d, "r1") for d in (0, 1, 2)]
    rows += [(d, "r2") for d in (10, 11)]
    return spark.createDataFrame(rows, "doc_id long, h string")


def test_hot_key_contributes_nothing(spark):
    pairs = capped_posting_pairs(_postings(spark), "h", "doc_id", CAP)
    got = {(r.doc_a, r.doc_b): r.shared for r in pairs.collect()}
    # exactly the rare-key pairs — the 190 hot-key pairs are fenced out
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 1, (10, 11): 1}
    # the Σ df·(df−1)/2 bound over SURVIVING keys: 3·2/2 + 2·1/2 = 4
    assert sum(got.values()) <= 4


def test_cap_bounds_join_rows_under_worst_case_skew(spark):
    # every key at exactly the cap: the bound is tight, not vacuous —
    # k keys × cap docs each → k · cap·(cap−1)/2 pair-rows, no more.
    k = 8
    rows = [(d + 100 * i, f"k{i}") for i in range(k) for d in range(CAP)]
    pairs = capped_posting_pairs(
        spark.createDataFrame(rows, "doc_id long, h string"),
        "h", "doc_id", CAP)
    n = pairs.agg(F.sum("shared")).first()[0]
    assert n == k * CAP * (CAP - 1) // 2


def test_cap_filter_sits_below_the_self_join(spark):
    """Structural pin: in the optimized logical plan the df<=cap
    Filter must be nested UNDER the pair self-join (children print
    after and deeper than their parent in the tree string), so the
    fence cuts the postings BEFORE they shuffle into the join."""
    pairs = capped_posting_pairs(_postings(spark), "h", "doc_id", CAP)
    tree = pairs._jdf.queryExecution().optimizedPlan().toString()
    lines = tree.splitlines()
    join_idx = next(i for i, ln in enumerate(lines) if "Join" in ln)
    filt_idx = next(i for i, ln in enumerate(lines)
                    if "Filter" in ln and "<= 5" in ln)
    assert filt_idx > join_idx, (
        "df-cap filter is not below the self-join:\n" + tree)

    def depth(ln):
        return len(ln) - len(ln.lstrip(" :+-"))

    assert depth(lines[filt_idx]) > depth(lines[join_idx]), (
        "df-cap filter does not nest under the self-join:\n" + tree)


def test_d_cdc_neardup_plan_carries_the_fence(spark, sf_dir):
    """The production query actually uses the fenced helper: its
    optimized plan contains the df<=50 filter below the first Join."""
    from go_whisper_spark.operators.llm_ops import d_cdc_neardup

    tree = d_cdc_neardup(spark, sf_dir)._jdf.queryExecution() \
        .optimizedPlan().toString()
    lines = tree.splitlines()
    join_idx = next(i for i, ln in enumerate(lines) if "Join" in ln)
    filt_idx = next(i for i, ln in enumerate(lines)
                    if "Filter" in ln and "<= 50" in ln)
    assert filt_idx > join_idx
