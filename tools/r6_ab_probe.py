"""Round-6 measurement script (VERDICT r5 tasks 7+8).

Runs, on sf0.1 with the bench session settings:
  A) graph_triangles x3 (matched-load re-check of the r5 +11% min-of-3)
  B) LSH bucket-cap A/B: dedup_minhash_lsh candidate path with
     max_bucket_size=None vs 10_000 (truncate), x3 each — the r5 family
     regression coincided with the cap stage landing; verify the cap's
     window aggregates per BUCKET (plan inspection) and price it.
Prints one JSON line per measurement; paste conclusions into SCALE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timeit(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    return ts


def main():
    import __spark_entry__ as entry
    from bigdata_tag_system_spark import get_spark
    from bigdata_tag_system_spark.operators import dedup as D

    spark = get_spark(app_name="r6_ab",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/region.parquet").count()

    qs = entry._build_queries()
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    # A) triangles, 3 samples
    tri = timeit(lambda: qs["graph_triangles"](spark, SF).count())
    print(json.dumps({"probe": "graph_triangles_x3", "samples": tri,
                      "min": min(tri)}))

    # B) cap A/B on the candidate-pair stage (the stage the cap changed)
    def pairs(cap, mode):
        return D.minhash_candidate_pairs(
            docs, num_hashes=32, bands=16,
            max_bucket_size=cap, on_overflow=mode).count()

    uncapped = timeit(lambda: pairs(None, "error"))
    capped = timeit(lambda: pairs(10_000, "truncate"))
    print(json.dumps({"probe": "lsh_cap_ab",
                      "uncapped": uncapped, "capped": capped,
                      "min_uncapped": min(uncapped),
                      "min_capped": min(capped)}))

    # plan check: the cap stage must be ONE window over the banded
    # relation partitioned by (band_id, band_hash) — per BUCKET, not a
    # per-pair construct after the join
    plan = D.minhash_candidate_pairs(
        docs, num_hashes=32, bands=16,
        max_bucket_size=10_000, on_overflow="truncate"
    )._jdf.queryExecution().optimizedPlan().toString()
    n_windows = plan.count("Window")
    join_before_window = plan.index("Join") < plan.index("Window") \
        if "Window" in plan and "Join" in plan else None
    print(json.dumps({
        "probe": "lsh_cap_plan",
        "n_window_ops": n_windows,
        # optimized-plan string is top-down: the Join appearing ABOVE
        # (before) the Window proves the cap runs on the banded input,
        # upstream of the pair join
        "window_is_below_join": bool(join_before_window),
        "window_partition_is_bucket": "band_id" in plan and "band_hash" in plan,
    }))

    # full catalog-query A/B (end-to-end dedup_minhash_lsh + incremental
    # + pipeline_keep as shipped, 3 samples — these call the truncate
    # path explicitly now)
    for name in ("dedup_minhash_lsh", "dedup_incremental",
                 "dedup_pipeline_keep"):
        ts = timeit(lambda: qs[name](spark, SF).count())
        print(json.dumps({"probe": f"{name}_x3", "samples": ts,
                          "min": min(ts)}))
    spark.stop()


if __name__ == "__main__":
    main()
