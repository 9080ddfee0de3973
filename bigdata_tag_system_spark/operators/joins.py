"""Join strategy helpers for skewed and co-located workloads.

The reference leaves all physical join strategy to Spark (SURVEY §2.3 —
single-key equi-joins, no hints). At 100 TB that is not enough: a handful
of hot user_ids (bots, service accounts) can put one shuffle partition
hours behind. AQE's skew-join split handles moderate skew between
similarly-sized sides; these helpers cover the cases it can't:

- :func:`salted_join` — explicit key salting for a big⋈medium join where
  the medium side is too large to broadcast but small enough to
  replicate ``salt``× (classic replicate-the-build-side pattern).
- :func:`write_bucketed` / :func:`bucketed_table` — persist fact tables
  bucketed by the join key so repeated per-key joins/aggregations read
  pre-shuffled data (SortMergeJoin with **zero Exchange**). This is the
  storage-level answer for pipelines that join the same key every run —
  e.g. user_id across fact tables, the exact shape of the tag engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    medium: DataFrame,
    on: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the big side salted and the medium side replicated.

    Each big-side row gets a random-but-deterministic salt in [0, salt)
    (hash of the whole row via ``xxhash64`` — no RNG, replayable); the
    medium side is exploded ``salt``× so every (key, salt) bucket finds
    its match. Hot keys spread across ``salt`` tasks instead of one.

    Use when: key skew is extreme, ``medium`` is over the broadcast
    threshold, and AQE's skew split still leaves a straggler. Cost:
    ``salt``× shuffle volume of the medium side — keep it for genuinely
    medium tables.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (semantics of others differ under replication)")
    salt_col = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    b = big.withColumn("_salt", salt_col)
    m = medium.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = b.join(m, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str] | str,
    num_buckets: int = 32,
    sort_cols: Sequence[str] | str | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Bucketing pre-shuffles on disk: any later equi-join or groupBy on
    ``bucket_cols`` between tables bucketed the same way runs with no
    Exchange (assert-tested). ``num_buckets`` should be sized so one
    bucket of the biggest table fits an executor core's working memory
    at target scale; both join sides must use the SAME bucket count.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.mode(mode)
        .format(format)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read back a bucketed table (bucket metadata comes from the catalog)."""
    return spark.table(table)


def adaptive_join(
    big: DataFrame,
    medium: DataFrame,
    on: str,
    how: str = "inner",
    share_threshold: float = 0.05,
    salt: int = 16,
) -> DataFrame:
    """Equi-join that measures key skew first and salts only if needed.

    Probes ``big`` with :func:`skew_stats` (one scan); if the hottest
    key exceeds ``share_threshold`` of all rows — i.e. one post-shuffle
    task would own ≥ that fraction of the join's left side — the join
    routes through :func:`salted_join`, otherwise through the planner's
    normal strategy (broadcast/SMJ + AQE). The probe costs one extra
    pass over ``big``: use for repeated production joins where the probe
    amortizes, not for one-off interactive queries.
    """
    share, _ = skew_stats(big, on, top_k=1)
    if share >= share_threshold:
        return salted_join(big, medium, on, how=how, salt=salt)
    return big.join(medium, on=on, how=how)


def skew_stats(
    df: DataFrame, key: str, top_k: int = 10
) -> tuple[float, list[tuple]]:
    """(top-key share, top-k key counts) — decide whether to salt.

    ``df`` is scanned ONCE: the grouped (key, count) table is persisted,
    then both the top-k and the grand total read the cached counts. A
    top-key share ≫ 1/shuffle partitions means one task owns that key's
    entire row set after any key-partitioned operation; beyond AQE's
    in-flight splitting, that's the signal to route the join through
    :func:`salted_join`.
    """
    from pyspark.storagelevel import StorageLevel

    grouped = df.groupBy(key).count().persist(StorageLevel.MEMORY_AND_DISK)
    try:
        counts = grouped.orderBy(F.desc("count"), key).limit(top_k).collect()
        total = grouped.agg(F.sum("count")).first()[0] or 0
    finally:
        grouped.unpersist()
    top = [(r[key], r["count"]) for r in counts]
    share = (top[0][1] / total) if total and top else 0.0
    return share, top
