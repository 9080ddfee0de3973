"""Dump ``.explain("formatted")`` output for catalog queries to files.

Usage: python tools/dump_plans.py --out plans/r14 --suffix before [name ...]

With no names, dumps every entry in ``__spark_entry__.queries()``.
Building a query's DataFrame may execute the one-time memo builds
(edge caches, stream replays) — that is the same work the bench's
iteration 0 performs, and the dumped plan is the steady-state plan the
warm iterations execute.

r14 (VERDICT r13 "evidence hygiene"): ``localCheckpoint`` calls made
during a query's build are intercepted and their INPUT plans appended
to the dump, so a plan whose leaves are ``Scan ExistingRDD`` stays
auditable — the retained subtree's pushed filters and join strategies
are visible in the "checkpoint input" sections instead of being hidden
behind the truncated leaf.
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

    # Intercept localCheckpoint so each dump can also show the plans
    # the checkpoint leaves hide (see module docstring).
    from pyspark.sql import DataFrame

    ckpt_inputs: list[str] = []
    orig_ckpt = DataFrame.localCheckpoint

    def _recording_ckpt(self, eager=True):
        try:
            ckpt_inputs.append(explain_formatted(self))
        except Exception:
            ckpt_inputs.append(traceback.format_exc())
        return orig_ckpt(self, eager=eager)

    DataFrame.localCheckpoint = _recording_ckpt

    failed = []
    for name in names:
        ckpt_inputs.clear()
        try:
            df = queries[name](spark, args.sf)
            txt = explain_formatted(df)
        except Exception:
            failed.append(name)
            txt = traceback.format_exc()
        # iterative loops checkpoint per round; the first few inputs
        # show the shape, the rest repeat it with a longer lineage
        for i, sub in enumerate(ckpt_inputs[:6]):
            txt += (f"\n\n=== checkpoint input {i} of {len(ckpt_inputs)} "
                    f"(plan behind Scan ExistingRDD leaf) ===\n{sub}")
        if len(ckpt_inputs) > 6:
            txt += (f"\n\n=== {len(ckpt_inputs) - 6} further checkpoint "
                    f"inputs omitted (per-round repeats) ===\n")
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"# wrote {path}", file=sys.stderr)
    DataFrame.localCheckpoint = orig_ckpt
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print(f"ok: {len(names)} plans -> {args.out}")


if __name__ == "__main__":
    main()
