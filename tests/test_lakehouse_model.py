"""Model-based testing of the lakehouse verb surface: a random
sequence of table operations (MoR upsert / MoR delete / compact /
copy-on-write merge with moving keys / OPTIMIZE) is replayed against a
plain Python dict reference, and after EVERY op the merged scan must
equal the model exactly.

This is the stateful-property complement of the per-verb pytests: the
individual verbs are each pinned in tests/test_lakehouse.py, but their
INTERLEAVINGS are where the sequencing rules live (equality deletes
shadow strictly-older directories; a compaction re-sequences
everything; a merge rewrite sheds tombstones by construction; OPTIMIZE
re-keys the whole table) — exactly the state space a random walk
covers and example-based tests don't.

Determinism: hypothesis drives the OP SEQUENCE; every op's data is a
pure function of the drawn integers, and the model is the independent
oracle.  Kept cheap: tiny key domain (collisions on purpose), ≤ 5 ops
per case, few examples — this is a semantic net, not a load test.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")

KEYS = list(range(12))          # small domain -> guaranteed collisions
N_PART = 3


def _rows_df(spark, rows):
    return spark.createDataFrame(
        [(k, v, k % N_PART) for k, v in rows], "k long, v long, b long"
    )


def _scan(spark, table):
    from go_whisper_spark.lakehouse import read_table_mor

    return sorted(
        (r.k, r.v, r.b)
        for r in read_table_mor(spark, table, key_cols=["k"]).collect()
    )


def _model_rows(model):
    return sorted((k, v, k % N_PART) for k, v in model.items())


# Each op is (tag, payload) drawn from pure integers so the sequence is
# reproducible from the hypothesis example alone.
_op = st.one_of(
    st.tuples(st.just("upsert"),
              st.lists(st.tuples(st.sampled_from(KEYS),
                                 st.integers(0, 99)),
                       min_size=1, max_size=4)),
    st.tuples(st.just("delete"),
              st.lists(st.sampled_from(KEYS), min_size=1, max_size=4)),
    st.tuples(st.just("compact"), st.just(None)),
    st.tuples(st.just("merge"),
              st.lists(st.tuples(st.sampled_from(KEYS),
                                 st.integers(100, 199)),
                       min_size=1, max_size=3)),
    st.tuples(st.just("optimize"), st.just(None)),
)


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(_op, min_size=1, max_size=5),
       seed=st.integers(0, 3))
def test_lakehouse_verbs_match_dict_model(spark, tmp_path_factory,
                                          ops, seed):
    from go_whisper_spark.lakehouse import (
        commit_partitions,
        compact_mor,
        delete_rows_mor,
        merge_table,
        optimize_table,
        upsert_rows_mor,
    )

    table = str(tmp_path_factory.mktemp("lake") / "t")
    base = [(k, 1000 + seed * 10 + k) for k in KEYS if (k + seed) % 2 == 0]
    model = dict(base)
    df = _rows_df(spark, base)
    commit_partitions(
        spark, table,
        {f"b={p}": df.where(F.col("b") == p) for p in range(N_PART)},
        base_version=0,
    )
    assert _scan(spark, table) == _model_rows(model)

    mor_live = False
    zlayout = False   # optimize re-keys to zbucket= — partition-
    #                   addressed merges are refused after that (the
    #                   guard this test FOUND the need for); row-level
    #                   changes go through the MoR verbs
    for tag, payload in ops:
        if tag == "upsert":
            batch = dict(payload)  # last write per key within the batch
            upsert_rows_mor(
                spark, table,
                _rows_df(spark, sorted(batch.items())),
                key_cols=["k"],
            )
            model.update(batch)
            mor_live = True
        elif tag == "delete":
            ks = sorted(set(payload))
            delete_rows_mor(
                spark, table,
                spark.createDataFrame([(k,) for k in ks], "k long"),
            )
            for k in ks:
                model.pop(k, None)
            mor_live = True
        elif tag == "compact":
            if mor_live:
                compact_mor(spark, table, key_cols=["k"], part_col="b")
                mor_live = False
                zlayout = False   # compaction mints b= keys and
                #                   removes the stale layout's keys
        elif tag == "merge":
            # copy-on-write rewrites refuse live MoR keys by contract
            if mor_live:
                compact_mor(spark, table, key_cols=["k"], part_col="b")
                mor_live = False
                zlayout = False
            batch = dict(payload)
            if zlayout:
                # the guard must refuse a partition-addressed merge on
                # the re-keyed table; the MoR upsert is the documented
                # path and must agree with the same model update
                with pytest.raises(ValueError, match="zbucket"):
                    merge_table(
                        spark, table,
                        _rows_df(spark, sorted(batch.items())),
                        key_cols=["k"], part_col="b",
                    )
                upsert_rows_mor(
                    spark, table,
                    _rows_df(spark, sorted(batch.items())),
                    key_cols=["k"],
                )
                mor_live = True
            else:
                merge_table(
                    spark, table,
                    _rows_df(spark, sorted(batch.items())),
                    key_cols=["k"], part_col="b",
                )
            model.update(batch)
        elif tag == "optimize":
            if mor_live:
                compact_mor(spark, table, key_cols=["k"], part_col="b")
                mor_live = False
                zlayout = False
            if model:  # a fully-emptied table has nothing to rewrite
                optimize_table(spark, table, zvalue=F.col("k"),
                               z_domain=len(KEYS), n_buckets=2)
                zlayout = True
        assert _scan(spark, table) == _model_rows(model), (
            f"diverged after {tag}({payload})"
        )


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(ops=st.lists(st.one_of(
    st.tuples(st.just("upsert"),
              st.lists(st.tuples(st.sampled_from(KEYS),
                                 st.integers(0, 99)),
                       min_size=1, max_size=4)),
    st.tuples(st.just("delete"),
              st.lists(st.sampled_from(KEYS), min_size=1, max_size=4)),
    st.tuples(st.just("delete_pos"),
              st.lists(st.sampled_from(KEYS), min_size=1, max_size=4)),
), min_size=1, max_size=5),
    seed=st.integers(0, 3))
def test_cdf_matches_model_snapshot_diffs(spark, tmp_path_factory,
                                          ops, seed):
    """Model-based CDF (round 16): a random interleaving of equality
    upserts, equality deletes and POSITIONAL deletes is replayed
    against per-version dict snapshots, and for every adjacent
    version pair plus the full range the O(changes) feed
    (`read_changes_mor`) must equal the snapshot set-diff exactly —
    deletes = old − new, inserts = new − old, by full row value.
    This walks the state space the example tests can't: pdv-after-dv
    interactions, re-adds after positional deletes, redundant
    tombstones, and ranges whose net change cancels."""
    from go_whisper_spark.lakehouse import (
        commit_partitions_pos,
        delete_rows_mor,
        delete_rows_pos,
        read_changes_mor,
        read_table_pos,
        upsert_rows_mor,
    )

    table = str(tmp_path_factory.mktemp("cdf") / "t")
    base = [(k, 1000 + seed * 10 + k) for k in KEYS if (k + seed) % 2 == 0]
    model = dict(base)
    df = _rows_df(spark, base)
    commit_partitions_pos(
        spark, table,
        {f"b={p}": df.where(F.col("b") == p) for p in range(N_PART)},
        base_version=0,
    )
    snaps = {1: dict(model)}
    v = 1
    for tag, payload in ops:
        if tag == "upsert":
            batch = dict(payload)
            upsert_rows_mor(
                spark, table,
                _rows_df(spark, sorted(batch.items())),
                key_cols=["k"],
            )
            model.update(batch)
        elif tag == "delete":
            ks = sorted(set(payload))
            delete_rows_mor(
                spark, table,
                spark.createDataFrame([(k,) for k in ks], "k long"),
            )
            for k in ks:
                model.pop(k, None)
        else:  # delete_pos: address every current physical row of ks
            ks = sorted(set(payload))
            addr = (
                read_table_pos(spark, table)
                .where(F.col("k").isin(ks))
                .select("_dir", "_pos")
            )
            delete_rows_pos(spark, table, addr)
            for k in ks:
                model.pop(k, None)
        v += 1
        snaps[v] = dict(model)

    def rows(d):
        return sorted((k, val, k % N_PART) for k, val in d.items())

    def feed(a, b):
        ch = read_changes_mor(spark, table, ["k"], a, b).collect()
        dels = sorted((r.k, r.v, r.b) for r in ch
                      if r._change_type == "delete")
        ins = sorted((r.k, r.v, r.b) for r in ch
                     if r._change_type == "insert")
        return dels, ins

    pairs = [(a, a + 1) for a in range(1, v)] + ([(1, v)] if v > 2 else [])
    for a, b in pairs:
        old, new = snaps[a], snaps[b]
        want_del = sorted(r for r in rows(old) if r not in rows(new))
        want_ins = sorted(r for r in rows(new) if r not in rows(old))
        got_del, got_ins = feed(a, b)
        assert got_del == want_del, (ops, seed, a, b)
        assert got_ins == want_ins, (ops, seed, a, b)


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(boxes=st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40),
              st.sampled_from([None, "l0", "l1", "l2"])),
    min_size=1, max_size=4))
def test_mixed_spec_pruning_never_loses_rows(spark, tmp_path_factory,
                                             boxes):
    """Property net for partition-spec evolution (round 16): on a
    table whose manifest mixes an id-range generation and a lang
    generation (each with its own zone-map stats), a stats-pruned
    range read must return EXACTLY the rows the unpruned filter
    returns, for arbitrary (id-range × optional lang) probe boxes —
    pruning is an optimization, never a correctness gate, including
    boxes that are empty, inverted, or entirely inside one
    generation."""
    from go_whisper_spark.lakehouse import (
        commit_partitions,
        read_table,
        read_table_range,
    )

    table = str(tmp_path_factory.mktemp("pe") / "t")
    rows = [(k, f"l{k % 3}") for k in range(40)]
    df = spark.createDataFrame(rows, "k long, lang string")
    g1 = df.where("k < 20").withColumn("rb", F.expr("k div 5"))
    g2 = df.where("k >= 20")
    commit_partitions(
        spark, table,
        {f"rb={b}": g1.where(F.col("rb") == b).drop("rb")
         for b in range(4)},
        base_version=0, minmax_cols=["k", "lang"],
    )
    commit_partitions(
        spark, table,
        {f"lang=l{i}": g2.where(F.col("lang") == f"l{i}")
         for i in range(3)},
        base_version=1, minmax_cols=["k", "lang"],
    )
    full = read_table(spark, table)
    for lo, hi, lang in boxes:
        preds = {"k": (lo, hi)}
        cond = F.col("k").between(lo, hi)
        if lang is not None:
            preds["lang"] = (lang, lang)
            cond = cond & F.col("lang").between(lang, lang)
        got = sorted((r.k, r.lang) for r in
                     read_table_range(spark, table, preds).collect())
        want = sorted((r.k, r.lang) for r in
                      full.where(cond).collect())
        assert got == want, (lo, hi, lang)
