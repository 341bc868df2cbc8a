"""Registry-rotation invariants for the driver contract.

The driver verifies only the FIRST 50 entries of ``queries()`` each
round, so ``__spark_entry__._registry()`` orders queries by
driver-verification recency (never-checked first, then oldest cohort).
These tests pin the load-bearing claims that previously lived only in
comments (ADVICE round 7, item 3):

- the pre-materialized round-N window lists exactly match the
  CORRECTNESS_r{N}.json the driver actually wrote;
- the registry order has no duplicates and covers every query;
- round 8's effective window (first 50) has ZERO overlap with round
  7's — the rotation footgun that burned rounds 6 and 7 cannot recur
  silently.
"""

import json
import os

import pytest

import __spark_entry__ as entry

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _correctness(round_no: int) -> dict:
    path = os.path.join(REPO, f"CORRECTNESS_r{round_no:02d}.json")
    if not os.path.exists(path):
        pytest.skip(f"CORRECTNESS_r{round_no:02d}.json not present")
    with open(path) as fh:
        return json.load(fh)


def test_r07_window_matches_driver_record():
    rec = _correctness(7)
    assert len(entry._R07_WINDOW) == 50
    assert len(set(entry._R07_WINDOW)) == 50
    assert set(entry._R07_WINDOW) == set(rec.keys())


def test_r07_window_disjoint_from_r06():
    rec6 = _correctness(6)
    assert not set(entry._R07_WINDOW) & set(rec6.keys())


def test_registry_order_no_duplicates_and_total():
    queries, oracles = entry._registry()
    names = list(queries)
    assert len(names) == len(set(names))
    # Every oracle key must be a registered query.
    assert set(oracles) <= set(queries)


def test_round8_window_fronts_r04_cohort():
    """First 50 of the rotated registry must not re-check round 7."""
    queries, _ = entry._registry()
    window = list(queries)[:50]
    rec7 = _correctness(7)
    overlap = set(window) & set(rec7.keys())
    assert not overlap, f"round-8 window re-checks round-7 greens: {sorted(overlap)}"
    # The round-4 cohort (oldest driver evidence) must front the window
    # right after any genuinely-new queries; in particular the m_* trio
    # whose byte-arithmetic oracles the driver has never seen.
    for name in ("m_decode_stats", "m_feature_norms", "m_frame_sample"):
        assert name in window, f"{name} missed the round-8 window"


def test_r08_window_matches_first_fifty():
    """The pre-materialized round-8 window list (the round-9 rotation
    seed) must stay equal to the registry's actual first 50 — the
    ADVICE-round-7 drift failure mode, now enforced for round 8."""
    queries, _ = entry._registry()
    assert entry._R08_WINDOW == list(queries)[:50]
    assert len(set(entry._R08_WINDOW)) == 50


def test_checked_cohorts_are_registered():
    """Every cohort name still resolves to a real query (catches renames)."""
    queries, _ = entry._registry()
    for lst in (entry._R04_CHECKED, entry._R05_CHECKED,
                entry._R6_DEFERRED, entry._R06_CHECKED, entry._R07_WINDOW,
                entry._R08_WINDOW, entry._R08_DEFERRED):
        missing = [n for n in lst if n not in queries]
        assert not missing, f"cohort names not in registry: {missing}"
