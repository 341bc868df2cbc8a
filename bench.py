"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full compute,
no driver-side collect skew).  Timings include Catalyst planning but
not session startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: whisper write/rollup/read paths, the relational joins,
# and the heavier LLM ops (LSH dedup, simhash pairs, cosine top-k).
HEADLINE = [
    "w_lww_1h",
    "w_cascade_1d",
    "w_fetch_dense_3d",
    "w_fetch_coarse_30d",
    "r_q1_pricing",
    "r_q3_revenue",
    "r_q5_nation_rev",
    "r_window_topk_cust",
    "d_jaccard_pairs",
    "d_lsh_pairs",
    "d_simhash_pairs",
    "s_cosine_topk",
    "s_cosine_ann",
    "d_embed_neardup_lsh",
    "t_lang_id",
    "t_quality",
    "t_tfidf_top3",
    "w_sessionize_30m",
    "w_percentiles_1d",
    "g_moving_avg_3",
    "g_as_percent",
    "r_rank_funcs",
    "r_exists_sql",
]


def main():
    import __spark_entry__ as entrymod
    from go_whisper_spark.session import get_spark

    spark = get_spark("go_whisper_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    # Warm-up pass: whole-stage codegen compilation costs 1-5s per novel
    # plan and amortizes to zero on any repeated/production workload —
    # measure steady state, not the JIT.
    spark.range(1000).count()
    for name in HEADLINE:
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    timings = {}
    t_all = time.time()
    for name in HEADLINE:
        fn = qs[name]
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
