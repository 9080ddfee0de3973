"""Measured A/B: AQE skew-join split vs a plain sort-merge join on a
planted hot key.

Stages a deliberately skewed fact relation (HOT_FRAC of all rows on one
key) joined to a per-key dim, forces the shuffle join path (broadcast
disabled so the skewed Exchange actually matters), and times the same
aggregate with `spark.sql.adaptive.skewJoin.enabled` on vs off —
the evidence behind SCALE.md's "skewed keys → AQE skew-join" row.
Salting (`operators/joins.py:salted_join`) is the manual fallback the
same measurement grades.

Usage: python tools/probe_skew_aqe.py [replicas] [iters]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
HOT_KEY = 0
HOT_PCT = int(os.environ.get("SPARK_GRAFT_SKEW_HOT_PCT", "90"))


def main() -> None:
    from pyspark.sql import functions as F

    from bigdata_tag_system_spark import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="probe_skew_aqe")
    spark.sparkContext.setLogLevel("ERROR")

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value")
    # replicate, then route HOT_PCT% of all rows to ONE hot key
    reps = spark.range(REPLICAS).select(F.col("id").alias("rep"))
    fact = (ev.crossJoin(F.broadcast(reps))
            .select(
                F.when(F.col("event_id") % 100 < HOT_PCT, F.lit(HOT_KEY))
                .otherwise(F.col("user_id")).alias("user_id"),
                (F.col("value") * 100).cast("long").alias("v")))
    dim = (ev.select("user_id").distinct()
           .withColumn("seg", F.col("user_id") % 7))
    fact = fact.persist()
    n_fact = fact.count()

    def run() -> float:
        t0 = time.perf_counter()
        (fact.join(dim, "user_id")
         .groupBy("seg").agg(F.sum("v").alias("s"))
         .orderBy("seg").collect())
        return time.perf_counter() - t0

    results = {}
    # broadcast off so the join genuinely shuffles both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "1MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                   "1MB")
    for flag in ("true", "false"):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", flag)
        times = [run() for _ in range(ITERS)]
        results[f"skew_join_{flag}"] = round(min(times), 3)
    print(json.dumps({
        "n_fact_rows": n_fact,
        "hot_key_share": HOT_PCT / 100.0,
        "min_of": ITERS,
        **results,
        "speedup": round(
            results["skew_join_false"] / results["skew_join_true"], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
