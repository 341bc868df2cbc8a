"""Per-query profiling harness for the optimization rounds.

For each named headline query: capture ``explain("formatted")`` to
``plans/r20/<name>_<tag>.txt``, then time REPS noop-sink runs after a
warm-up (the bench.py methodology, minus the other 60 queries) and
print build-time (DataFrame construction + analysis) next to the
execution medians, so planning-bound queries are distinguishable from
compute-bound ones.

Usage: python tools/profile_bench.py [--tag before|after] [--reps N]
           [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default=None,
                    help="write plans/r20/<q>_<tag>.txt (omit to skip)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from go_whisper_spark.session import get_spark

    spark = get_spark("go_whisper_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    spark.range(1000).count()

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r20")
    os.makedirs(plan_dir, exist_ok=True)

    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}:warmup")
        # warm-up (also builds any memoized substrate, as in bench.py)
        t0 = time.time()
        df = fn(spark, args.sf_dir)
        build_s = time.time() - t0
        if args.tag:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{args.tag}.txt"),
                      "w") as fh:
                fh.write(buf.getvalue())
        df.write.format("noop").mode("overwrite").save()
        samples = []
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"profile:{name}:rep{r}")
            t0 = time.time()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite").save()
            samples.append(time.time() - t0)
        med = statistics.median(samples)
        print(f"{name:<26} build={build_s:6.3f}s  "
              f"median={med:6.3f}s  min={min(samples):6.3f}s  "
              f"reps={[round(s, 3) for s in samples]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
