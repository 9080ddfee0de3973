"""Split a catalog query's wall time into build / optimize / execute.

Usage: python tools/profile_query.py [--sf DIR] [--iters N] query [...]

For each query, per iteration:
  build_s    — entry fn(spark, sf_dir): Python DataFrame construction
               (includes any driver-side probes/collects the entry does)
  plan_s     — force analysis+optimization+physical planning via
               queryExecution().executedPlan (no job run; AQE final
               re-plan still happens during execute)
  exec_s     — df.count() (the bench's timed action)

Catalyst planning cost is DRIVER-side, single-threaded: a query whose
plan_s dominates is bottlenecked on plan size (guide §7.3), not on
executors, and the fix is lineage truncation, not shuffle tuning.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bigdata_tag_system_spark import get_spark

    spark = get_spark(app_name="profile_query",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    # standard warmup (bench.py parity)
    spark.read.parquet(f"{args.sf}/region.parquet").count()
    spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

    for name in args.names:
        fn = qs[name]
        rows = []
        for it in range(args.iters):
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            t1 = time.perf_counter()
            # force full planning without running a job
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.count()
            t3 = time.perf_counter()
            rows.append((t1 - t0, t2 - t1, t3 - t2))
            print(f"{name} it{it}: build={t1-t0:.3f} plan={t2-t1:.3f} "
                  f"exec={t3-t2:.3f} total={t3-t0:.3f}", flush=True)
        b = min(r[0] for r in rows)
        p = min(r[1] for r in rows)
        e = min(r[2] for r in rows)
        print(f"{name} MIN: build={b:.3f} plan={p:.3f} exec={e:.3f} "
              f"total={b+p+e:.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
