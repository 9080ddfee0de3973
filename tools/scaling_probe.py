"""Scaling probe: stage an N×-scaled copy of a test SF and measure how
catalog queries grow with corpus size.

The 5× copy is N id-shifted unions of the base tables — row counts
scale exactly N× (true-duplicate DENSITY grows ~N² across copies, so
dedup joins legitimately produce ~N²·pairs; judge ratios against that,
not against N). Prints a ratio table; anything growing faster than both
N and the true-pair growth hides a corpus-quadratic term (this tool
caught the length-band fuzzy join at 11.7× for 5× — see SCALE.md).

Usage:
    python tools/scaling_probe.py [N] [query ...]
Defaults: N=5, a representative heavy slice.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    "tag_profiles", "dedup_exact_groups", "events_daily_rollup",
    "tpch_q1", "text_top_tokens", "text_bigram_lm",
    "dedup_minhash_lsh", "dedup_fuzzy_edit", "dedup_ngram_jaccard",
    "dedup_containment", "dedup_simhash_portable", "events_islands",
]

SHIFTS = {
    "customer": ("c_custkey", 100_000),
    "documents": ("doc_id", 100_000),
    "events": ("event_id", 1_000_000),
    "lineitem": ("l_orderkey", 1_000_000),
    "orders": ("o_orderkey", 1_000_000),
    "embeddings": ("vec_id", 1_000_000),
}


def stage(spark, n: int) -> str:
    from pyspark.sql import functions as F

    out = f"/tmp/scaling_probe_{n}x"
    os.makedirs(out, exist_ok=True)
    for t, (key, step) in SHIFTS.items():
        dst = f"{out}/{t}.parquet"
        if os.path.exists(f"{dst}/_SUCCESS"):
            continue
        src = f"{BASE}/{t}.parquet"
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        parts = []
        for i in range(n):
            d = df.withColumn(key, F.col(key) + F.lit(i * step))
            if t == "events":
                d = d.withColumn(
                    "user_id", F.col("user_id") + F.lit(i * 100_000))
            if t == "orders":
                d = d.withColumn(
                    "o_custkey", F.col("o_custkey") + F.lit(i * 100_000))
            parts.append(d)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(dst)
    # dims stay unscaled (facts grow, catalogs don't) — link them in so
    # star-join queries (TPC-H etc.) resolve every table
    for fname in os.listdir(BASE):
        if not fname.endswith(".parquet"):
            continue
        dst = f"{out}/{fname}"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{fname}", dst)
    return out


def main() -> None:
    import __spark_entry__ as entry
    from bigdata_tag_system_spark import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    names = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark(app_name="scaling_probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = stage(spark, n)
    q = entry._build_queries()

    def best_of(fn, d, k=2):
        ts = []
        for _ in range(k):
            t0 = time.perf_counter()
            fn(spark, d).count()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    print(f"{'query':28s}{'1x':>8s}{f'{n}x':>8s}{'ratio':>7s}")
    for name in names:
        t1 = best_of(q[name], BASE)
        tn = best_of(q[name], scaled)
        print(f"{name:28s}{t1:8.2f}{tn:8.2f}{tn / t1:7.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
