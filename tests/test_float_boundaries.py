"""One-time-per-run verification of the g_exp / g_sigmoid floor-
truncation determinism argument (ADVICE round 7, item 4).

Claim under test: for every cents value the events generator can
produce (round(value*100) ∈ [0, 60000] at every scale factor — the
observed maxima are 32753 / 49002 / 56021 at sf0.001/0.01/0.1), the
TRUE values of exp(c/10000)·1e6 and sigmoid(c/10000)·1e6 are far
enough from every integer that a correctly-rounded engine and a
1-ulp-off libm engine cannot floor to different 1e-6 buckets.

Method: 40-digit decimal arithmetic enumerates the whole finite
domain.  Safety bar: distance to the nearest integer must exceed
16 ulps of the product — far above any plausible cross-libm exp()
disagreement (libm exp is typically <1 ulp off; 16 is paranoia).

c = 0 is excluded from the distance check deliberately: exp(0) = 1
and sigmoid(0) = 0.5 sit EXACTLY on boundaries, but both are exact
IEEE results (no libm rounding happens for the zero input), so both
engines floor the identical double — verified separately below.
"""

import decimal
import math
from decimal import Decimal

import duckdb

# Covers every SF's observed cents maximum (56021 at sf0.1) with margin.
CENTS_MAX = 60000
SAFETY_ULPS = 16


def _min_boundary_distances():
    decimal.getcontext().prec = 40
    min_exp = min_sig = Decimal(9)
    for c in range(1, CENTS_MAX + 1):
        x = Decimal(c) / Decimal(10000)
        ye = x.exp() * 1_000_000
        fr = ye - int(ye)
        min_exp = min(min_exp, fr, 1 - fr)
        ys = (1 / (1 + (-x).exp())) * 1_000_000
        fr = ys - int(ys)
        min_sig = min(min_sig, fr, 1 - fr)
    return float(min_exp), float(min_sig)


def test_exp_sigmoid_floor_boundaries_clear():
    d_exp, d_sig = _min_boundary_distances()
    # Largest product ulps over the domain: exp ≤ e^6·1e6, sigmoid < 1e6.
    ulp_exp = math.ulp(math.exp(CENTS_MAX / 10000.0) * 1e6)
    ulp_sig = math.ulp(1e6)
    assert d_exp > SAFETY_ULPS * ulp_exp, (d_exp, ulp_exp)
    assert d_sig > SAFETY_ULPS * ulp_sig, (d_sig, ulp_sig)


def test_zero_cents_is_exact():
    # The only on-boundary inputs are computed without libm rounding.
    assert math.exp(0.0) == 1.0
    assert 1.0 / (1.0 + math.exp(-0.0)) == 0.5


def test_sin_generator_boundaries_clear():
    """g_sin_function's 24 hour-angle values: the true scaled sine must
    clear every 1e-6 floor boundary by a wide margin.  The angle is
    (2k+1)·π/24 — odd multiples only, so sin never sits at ±1/0 where
    a boundary lives.  True values via a Decimal Taylor sine of the
    exact DOUBLE argument both engines compute."""
    decimal.getcontext().prec = 50

    def dsin(x):
        decimal.getcontext().prec += 10
        i, last, s, sign, num, fact = 1, Decimal(0), x, 1, x, 1
        while s != last:
            last = s
            i += 2
            fact *= i * (i - 1)
            num *= x * x
            sign = -sign
            s += sign * num / fact
        decimal.getcontext().prec -= 10
        return +s

    min_d = Decimal(9)
    for k in range(24):
        arg_d = (2 * k + 1) * math.pi / 24.0
        v = Decimal("42.5") * dsin(Decimal(repr(arg_d))) * 1_000_000
        fr = v - int(v)
        if fr < 0:
            fr += 1
        min_d = min(min_d, fr, 1 - fr)
    ulp = math.ulp(42.5e6)
    assert float(min_d) > SAFETY_ULPS * ulp, (float(min_d), ulp)


def test_testdata_cents_within_verified_domain():
    """The enumeration bound must cover the actual generator output."""
    for sf in ("0.001", "0.01", "0.1"):
        lo, hi = duckdb.sql(
            "SELECT min(round(value*100)), max(round(value*100)) "
            f"FROM '/root/testdata/sf{sf}/events.parquet'"
        ).fetchone()
        assert lo >= 0 and hi <= CENTS_MAX, (sf, lo, hi)


def test_unigram_surprisal_boundaries_clear():
    """t_unigram_logprob floors -ln(count/total)·1e6 ONCE per distinct
    vocabulary entry; a 1-ulp ln() disagreement between JVM and DuckDB
    can only flip a floor if the TRUE micro-nat value sits within a
    few ulps of an integer.  Enumerate every (count, total) pair in
    every fixture and verify 50-digit-decimal clearance.  ln(p) of a
    rational p != 1 is irrational (Lindemann), so exact boundaries are
    impossible; this pins the quantitative margin."""
    decimal.getcontext().prec = 50
    for sf in ("0.001", "0.01", "0.1"):
        rows = duckdb.sql(
            f"""
            WITH tokd AS (
              SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
              FROM '/root/testdata/sf{sf}/documents.parquet'
            ),
            uni AS (SELECT t, count(*) AS cnt FROM tokd GROUP BY 1)
            SELECT DISTINCT cnt, (SELECT sum(cnt) FROM uni) AS total FROM uni
            """
        ).fetchall()
        assert rows, sf
        min_d, max_val = Decimal(9), 0.0
        for cnt, total in rows:
            v = -(Decimal(int(cnt)) / Decimal(int(total))).ln() * 1_000_000
            fr = v - int(v)
            min_d = min(min_d, fr, 1 - fr)
            max_val = max(max_val, float(v))
        ulp = math.ulp(max_val)
        assert float(min_d) > SAFETY_ULPS * ulp, (sf, float(min_d), ulp)


def test_bigram_surprisal_boundaries_clear():
    """t_bigram_logprob's three probability classes: every DOUBLE the
    engines feed to ln() — C2/C1(w1), 0.4·C1(w2)/N, 0.4/N, computed
    with the identical IEEE op order in Python here — must have its
    TRUE -ln(p)·1e6 clear of every integer by >> ln's ulp error."""
    decimal.getcontext().prec = 50
    for sf in ("0.001", "0.01", "0.1"):
        con = duckdb.sql(
            f"""
            WITH tokd AS (
              SELECT doc_id,
                     CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                          AS BIGINT) % 100 AS bucket,
                     generate_subscripts(regexp_extract_all(lower(text), '[a-z0-9]+'), 1) AS pos,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
              FROM '/root/testdata/sf{sf}/documents.parquet'
            ),
            train AS (SELECT * FROM tokd WHERE bucket < 90),
            c2 AS (
              SELECT a.w w1, b.w w2, count(*) c2 FROM train a
              JOIN train b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
              GROUP BY 1, 2
            ),
            c1 AS (SELECT w, count(*) c1 FROM train GROUP BY 1),
            tot AS (SELECT CAST(sum(c1) AS BIGINT) N FROM c1)
            SELECT DISTINCT c2.c2, c1.c1, (SELECT N FROM tot) AS N, 'pair' AS k
            FROM c2 JOIN c1 ON c1.w = c2.w1
            UNION ALL
            SELECT DISTINCT NULL, c1, (SELECT N FROM tot), 'uni' FROM c1
            """
        ).fetchall()
        n_total = con[0][2]
        # seen-bigram class uses C1(w1); backoff uses C1(w2) — the
        # 'uni' arm covers EVERY unigram count, not just w1 positions.
        probs = {c2 / c1 for c2, c1, _, k in con if k == "pair"}
        probs |= {0.4 * c1 / n for _, c1, n, k in con if k == "uni"}
        probs.add(0.4 / n_total)
        min_d, max_val = Decimal(9), 0.0
        for p in probs:
            v = -Decimal(p).ln() * 1_000_000
            fr = v - int(v)
            min_d = min(min_d, fr, 1 - fr)
            max_val = max(max_val, float(v))
        ulp = math.ulp(max_val)
        assert float(min_d) > SAFETY_ULPS * ulp, (sf, float(min_d), ulp)
