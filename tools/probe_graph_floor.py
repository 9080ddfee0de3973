"""R10 probe: the iterative-graph scheduling floor (r9 VERDICT Next #4).

A/B-measures, at sf0.1 on the bench session shape:
  1. graph_bfs_depths as shipped (per-call edge self-join + per-round
     lazy localCheckpoint);
  2. BFS reading the `_copurchase_edges` parquet memo (amortize the
     edge build like the other four graph consumers);
  3. BFS with lineage truncated every OTHER round instead of every
     round (is the checkpoint itself part of the floor?);
  4. jobs-per-entry via job groups, to separate scheduling floor from
     compute.

Prints a small JSON report; conclusions land in SCALE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(spark, name, fn, iters=3):
    walls, jobs = [], []
    for i in range(iters):
        sc = spark.sparkContext
        group = f"{name}-{i}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        n = fn().count()
        walls.append(round(time.perf_counter() - t0, 3))
        tracker = sc.statusTracker()
        jobs.append(len(tracker.getJobIdsForGroup(group)))
        sc.setJobGroup("", "")
    return {"rows": n, "wall_min": min(walls), "walls": walls,
            "jobs": jobs[0]}


def bfs_alt_cadence(edges, source, checkpoint_every=2, max_rounds=64):
    """bfs_depths with lineage truncated every `checkpoint_every` rounds
    (probe-only copy; the shipped operator truncates every round)."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    sym = edges.select(F.col("src").alias("_u"), F.col("dst").alias("_v"))
    sym = sym.unionAll(sym.select(F.col("_v").alias("_u"),
                                  F.col("_u").alias("_v"))) \
        .repartition("_u").persist(StorageLevel.MEMORY_AND_DISK)
    visited = (
        sym.sparkSession.createDataFrame([(source, 0)], ["node", "depth"])
        .localCheckpoint(eager=False))
    frontier = visited.select("node")
    try:
        for d in range(1, max_rounds + 1):
            nxt = (
                frontier.join(sym, frontier.node == sym._u)
                .select(F.col("_v").alias("node")).distinct()
                .join(visited, "node", "left_anti"))
            if d % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=False)
            if nxt.limit(1).count() == 0:
                return visited.localCheckpoint(eager=True)
            visited = visited.unionByName(
                nxt.select("node", F.lit(d).alias("depth")))
            if d % checkpoint_every == 0:
                visited = visited.localCheckpoint(eager=False)
            frontier = nxt
        raise RuntimeError("max_rounds exceeded")
    finally:
        sym.unpersist()


def main():
    import __spark_entry__ as e
    from bigdata_tag_system_spark import get_spark
    from bigdata_tag_system_spark.operators.graph import bfs_depths

    spark = get_spark(app_name="probe_graph_floor",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF}/region.parquet").count()

    q = e._build_queries()
    out = {}

    out["bfs_shipped"] = timed(
        spark, "bfs_shipped", lambda: q["graph_bfs_depths"](spark, SF))

    memo = e._copurchase_edges(spark, SF)

    def hist(df):
        from pyspark.sql import functions as F
        return (df.groupBy("depth")
                .agg(F.count(F.lit(1)).alias("n_nodes")).orderBy("depth"))

    out["bfs_memo_edges"] = timed(
        spark, "bfs_memo_edges", lambda: hist(bfs_depths(memo, 0)))
    out["bfs_memo_ckpt2"] = timed(
        spark, "bfs_memo_ckpt2",
        lambda: hist(bfs_alt_cadence(memo, 0, checkpoint_every=2)))
    out["bfs_memo_nockpt"] = timed(
        spark, "bfs_memo_nockpt",
        lambda: hist(bfs_alt_cadence(memo, 0, checkpoint_every=10 ** 6)))

    # jobs-per-entry for the rest of the iterative family, as shipped
    for name in ("graph_kcore", "graph_event_pagerank",
                 "dedup_components", "graph_part_hierarchy"):
        out[name] = timed(spark, name, lambda n=name: q[n](spark, SF))

    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
