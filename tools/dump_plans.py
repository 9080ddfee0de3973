"""Dump ``.explain("formatted")`` output for catalog queries to files.

Usage: python tools/dump_plans.py --out plans/r13 --suffix before [name ...]

With no names, dumps every entry in ``__spark_entry__.queries()``.
Building a query's DataFrame may execute the one-time memo builds
(edge caches, stream replays) — that is the same work the bench's
iteration 0 performs, and the dumped plan is the steady-state plan the
warm iterations execute.
"""
from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from bigdata_tag_system_spark import get_spark

    spark = get_spark(app_name="dump_plans",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    names = args.names or list(queries)
    os.makedirs(args.out, exist_ok=True)
    failed = []
    for name in names:
        try:
            df = queries[name](spark, args.sf)
            txt = explain_formatted(df)
        except Exception:
            failed.append(name)
            txt = traceback.format_exc()
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# wrote {path}", file=sys.stderr)
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print(f"ok: {len(names)} plans -> {args.out}")


if __name__ == "__main__":
    main()
