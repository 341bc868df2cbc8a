"""The count-drift gate runs as part of the suite (VERDICT r11 item 2:
stale doc counts were a three-round recurring finding — README 307 vs
a 308-entry registry, a deferred NOTE saying 27 for a 31-entry list).
`tools/check_counts.py` holds the greps; this test just makes drift a
suite failure instead of a judge finding."""

import sys
import os

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from tools.check_counts import check
from tools.check_output_shapes import connect, non_scalar_columns

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_no_count_drift():
    problems = check()
    assert not problems, "\n".join(problems)


def test_all_oracle_outputs_scalar():
    """Driver-contract shape guard (VERDICT r12 item 2): the driver's
    pandas canonicalizer cannot sort list/struct/map cells, so EVERY
    registered oracle must project scalar top-level columns only.
    DESCRIBE is schema inference — the full registry sweeps in ~2s."""
    import __spark_entry__ as entry

    con = connect(SF_DIR)
    offenders = {
        name: bad
        for name, sql in entry.oracle_sql().items()
        if (bad := non_scalar_columns(con, sql))
    }
    assert not offenders, f"non-scalar output columns: {offenders}"


def test_shape_guard_flags_array_output():
    """The guard itself must be RED on a deliberately array-typed
    projection (the exact shape that broke ``s_kmeans_step`` in r12)
    and on STRUCT/MAP outputs."""
    con = connect(SF_DIR)
    red = "SELECT r_regionkey, list(r_name) AS names FROM region GROUP BY 1"
    assert non_scalar_columns(con, red) == [("names", "VARCHAR[]")]
    red2 = "SELECT struct_pack(a := 1, b := 2) AS s, map([1],[2]) AS m"
    assert {n for n, _ in non_scalar_columns(con, red2)} == {"s", "m"}
    ok = "SELECT r_regionkey, count(*) AS n FROM region GROUP BY 1"
    assert non_scalar_columns(con, ok) == []
