"""Item-9 experiment (VERDICT r19): do warm Python-worker pools
perturb adjacent JVM-only queries in an interleaved bench run?

Method: ONE session.  Warm up a fixed set of JVM-only queries (the
r19 "drifted −10-20%, untouched" cohort), measure them (REPS reps,
workers COLD — no Python kernel has run, so no worker pool exists),
then run the kernel-heavy queries that spawn the 32-worker pools
(m_shot_bounds, s_semantic_dedup, s_cosine_topk), then re-measure the
SAME JVM-only set (workers WARM and resident, ~170 MB RSS each).
JIT/codegen is warm in both phases (the warm-up pass), so the only
intended difference is the resident worker pool.  Load average is
recorded per phase — on this shared sandbox co-tenant waves are the
main confounder, so run on a quiet window and read the medians.

Usage: python tools/worker_interference.py [--reps N] [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

JVM_ONLY = [
    "w_cascade_1d", "w_fetch_dense_3d", "w_sessionize_30m",
    "r_rank_funcs", "g_interpolate", "t_stratified_sample",
    "w_funnel_4step", "w_topk_mg", "r_q6_forecast",
]
KERNEL_HEAVY = ["m_shot_bounds", "s_semantic_dedup", "s_cosine_topk"]


def _load():
    with open("/proc/loadavg") as fh:
        return fh.read().split()[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from go_whisper_spark.session import get_spark

    spark = get_spark("gws_worker_interference")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name):
        qs[name](spark, args.sf_dir).write.format("noop").mode(
            "overwrite").save()

    def measure(names, tag):
        out = {}
        for n in names:
            samples = []
            for _ in range(args.reps):
                t0 = time.time()
                run(n)
                samples.append(time.time() - t0)
            out[n] = round(statistics.median(samples), 3)
        return out

    # codegen warm-up for the JVM set (no Python kernels touched)
    for n in JVM_ONLY:
        run(n)
    load_cold = _load()
    cold = measure(JVM_ONLY, "cold")

    # spawn + keep the worker pools (also their own warm-up)
    for n in KERNEL_HEAVY:
        run(n)
        run(n)
    load_warm = _load()
    warm = measure(JVM_ONLY, "warm")

    ratios = {n: round(warm[n] / cold[n], 3) for n in JVM_ONLY}
    print(json.dumps({
        "reps": args.reps,
        "load_at_cold": load_cold,
        "load_at_warm": load_warm,
        "cold_medians": cold,
        "warm_medians": warm,
        "warm_over_cold": ratios,
        "median_ratio": round(statistics.median(ratios.values()), 3),
    }, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
