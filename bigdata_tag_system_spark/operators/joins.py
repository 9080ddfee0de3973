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


def _bloom_params(num_bits: int, num_hashes: int) -> int:
    """Validate (power-of-two bits, sane hash count); return log2(bits)."""
    if num_bits < 64 or num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two >= 64, got {num_bits}")
    if not 1 <= num_hashes <= 16:
        raise ValueError(f"num_hashes must be in [1, 16], got {num_hashes}")
    return num_bits.bit_length() - 1


def _bloom_hash_cols(key: str, num_bits: int, num_hashes: int):
    """(h1, h2) double-hash columns for ``key`` — position ``i`` is
    ``(h1 + i*h2) & (num_bits-1)``. See
    ``functions/text.py:portable_hash_pair`` for the oracle-replayable
    bit layout (shared with the Count-Min sketch)."""
    from bigdata_tag_system_spark.functions.text import portable_hash_pair

    _bloom_params(num_bits, num_hashes)
    return portable_hash_pair(F.col(key).cast("string"), num_bits)


def bloom_filter_bits(
    df: DataFrame,
    key: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> list[int]:
    """Build a bloom filter over ``df[key]`` → packed int64 words.

    The distributed part reduces ``df`` to its DISTINCT set bit
    positions (map-side partial distinct, one shuffle of ≤ ``num_bits``
    ints); the driver collect is bounded by ``num_bits`` REGARDLESS of
    input size — the same bounded-collect contract as the IVF centroid
    fit. Packing into ``num_bits/64`` signed int64 words happens
    driver-side so the filter ships to executors as one small literal
    array (8 KB at the default 2^16 bits).

    This is the manual runtime-filter (semi-join reduction) pattern:
    Spark's own InSubquery/bloom runtime filters are planner-internal
    and version-gated; building the bitmap explicitly keeps the
    technique available on any join shape and lets the probe-side test
    stay a map-only scan predicate.
    """
    _bloom_params(num_bits, num_hashes)
    h1, h2 = _bloom_hash_cols(key, num_bits, num_hashes)
    keyed = df.select(h1.alias("_h1"), h2.alias("_h2")).where(
        F.col("_h1").isNotNull()
    )
    pos = keyed.select(
        F.explode(
            F.array(*[
                (F.col("_h1") + F.lit(i) * F.col("_h2"))
                .bitwiseAND(F.lit(num_bits - 1))
                for i in range(num_hashes)
            ])
        ).alias("_p")
    ).distinct()
    words = [0] * (num_bits // 64)
    for row in pos.collect():
        p = row["_p"]
        words[p >> 6] |= 1 << (p & 63)
    # pack as SIGNED int64 (bit 63 set → negative) so F.lit round-trips
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_flag(
    big: DataFrame,
    key: str,
    words: list[int],
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
    flag_col: str = "bloom_pass",
) -> DataFrame:
    """``big`` plus a boolean ``flag_col``: does ``key`` pass the bloom
    filter ``words``? The membership test as a COLUMN, so callers can
    count/split/audit without a second scan (``bloom_prefilter`` is
    the filtering specialization)."""
    _bloom_params(num_bits, num_hashes)
    if len(words) != num_bits // 64:
        raise ValueError(
            f"words has {len(words)} entries, expected {num_bits // 64}")
    h1, h2 = _bloom_hash_cols(key, num_bits, num_hashes)
    probed = big.withColumn("_h1", h1).withColumn("_h2", h2)
    tests = []
    for i in range(num_hashes):
        p = f"((_h1 + {i} * _h2) & {num_bits - 1})"
        tests.append(
            f"(shiftrightunsigned(element_at(_bloom_w, "
            f"cast(shiftright({p}, 6) as int) + 1), "
            f"cast(({p} & 63) as int)) & 1) = 1"
        )
    return (
        probed.withColumn("_bloom_w", F.array(*[F.lit(w) for w in words]))
        .withColumn(flag_col, F.expr(" AND ".join(tests)))
        .drop("_h1", "_h2", "_bloom_w")
    )


def bloom_prefilter(
    big: DataFrame,
    key: str,
    words: list[int],
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Rows of ``big`` whose ``key`` passes the bloom filter ``words``.

    No false negatives (every true match survives); false positives at
    the classic ``(1 - e^{-kn/m})^k`` rate must be removed by the exact
    join that follows. The test is a pure map-only scan predicate —
    ``num_hashes`` element_at + shift + AND ops against a broadcast-
    literal word array, zero shuffle, zero Python — so at 100 TB the
    probe side drops non-matching rows BEFORE the join shuffle instead
    of after it (the whole point: shuffle volume scales with the match
    rate, not the table size).
    """
    return bloom_flag(
        big, key, words, num_bits, num_hashes, flag_col="_bloom_pass"
    ).where(F.col("_bloom_pass")).drop("_bloom_pass")


def join_delta(
    r_old: DataFrame,
    r_new: DataFrame,
    s_old: DataFrame,
    s_new: DataFrame,
    on: Sequence[str] | str,
) -> DataFrame:
    """The DELTA of an inner join under two-sided inserts — classic
    incremental view maintenance algebra:

        Δ(R ⋈ S) = (ΔR ⋈ S_old) ∪ (R_old ⋈ ΔS) ∪ (ΔR ⋈ ΔS)

    Appending this to the stored ``R_old ⋈ S_old`` result yields
    exactly the full recomputed join (the four quadrants partition it),
    without ever re-running the old×old quadrant — at 100 TB that
    quadrant IS the view, and re-joining it every batch is the cost
    IVM exists to avoid. Each delta term has at least one small (delta)
    side, so the planner broadcasts it; the maintenance batch costs
    O(|Δ| × matches), independent of history size.

    Inner-join inserts only (deletes need the symmetric anti-join
    terms; outer joins need null-row compensation — both out of scope
    here and loudly absent rather than silently wrong).
    """
    on = [on] if isinstance(on, str) else list(on)
    return (
        r_new.join(s_old, on)
        .unionByName(r_old.join(s_new, on))
        .unionByName(r_new.join(s_new, on))
    )


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
