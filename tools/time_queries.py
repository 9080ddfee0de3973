"""Min-of-N wall-clock for specific catalog queries (A/B harness).

Usage: python tools/time_queries.py [--sf DIR] [--iters N] query [query ...]

Prints per-query min/median over N iterations after the standard JVM +
Python-worker warmup bench.py uses, so numbers are comparable to the
per-round BENCH files.
"""
from __future__ import annotations

import argparse
import os
import statistics
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

    spark = get_spark(app_name="time_queries",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    spark.read.parquet(f"{args.sf}/region.parquet").count()
    spark.range(8).mapInPandas(lambda it: it, schema="id long").count()

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for it in range(args.iters):
        for name in args.names:
            t0 = time.perf_counter()
            n_rows = queries[name](spark, args.sf).count()
            dt = time.perf_counter() - t0
            samples[name].append(dt)
            print(f"# iter{it} {name}: {dt:.3f}s ({n_rows} rows)",
                  file=sys.stderr)
    for name, ts in samples.items():
        print(f"{name}: min={min(ts):.3f}s "
              f"median={statistics.median(ts):.3f}s n={len(ts)}")


if __name__ == "__main__":
    main()
