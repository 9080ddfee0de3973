"""Approximate aggregate sketches with built-in accuracy checks.

At 100 TB, exact ``count(DISTINCT)`` and exact percentiles are shuffle-
heavy (distinct re-shuffles the fact table; exact percentile needs a
sort or a full value multiset per group). Spark ships mergeable sketches
— HyperLogLog++ (``approx_count_distinct``) and a Greenwald-Khanna /
KLL-style quantile sketch (``percentile_approx``) — that aggregate
map-side in O(1) memory per partition and merge associatively, the
pattern that scales.

Each helper here returns BOTH the sketch estimate and an exactness
check against the exact computation, so accuracy is a first-class,
testable property instead of a hope: at small scale the harness
cross-checks the exact value against DuckDB while asserting the sketch
landed within tolerance; at production scale callers drop the exact
column and keep the sketch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_count_check(
    df: DataFrame,
    col: str,
    rsd: float = 0.05,
    tolerance: float = 0.05,
) -> DataFrame:
    """One row: exact distinct count, HLL++ estimate, and whether the
    estimate landed within ``tolerance`` (relative).

    ``rsd`` is the HLL++ target relative standard deviation (drives
    sketch width: ~1.04/√m). The exact branch is the expensive one —
    it exists for verification; production pipelines keep only
    ``approx_cnt``.
    """
    return df.agg(
        F.countDistinct(col).alias("exact_cnt"),
        F.approx_count_distinct(col, rsd=rsd).alias("approx_cnt"),
    ).select(
        "exact_cnt",
        "approx_cnt",
        (
            F.abs(F.col("approx_cnt") - F.col("exact_cnt"))
            <= F.lit(tolerance) * F.col("exact_cnt")
        ).alias("within_tolerance"),
    )


def quantile_check(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.5, 0.9, 0.99),
    relative_tolerance: float = 0.05,
    accuracy: int = 10000,
) -> DataFrame:
    """One row per probability: exact percentile (interpolated,
    ``percentile`` — matches ANSI ``percentile_cont``), the sketch
    estimate (``percentile_approx``), and a within-tolerance flag.

    The sketch guarantees RANK error ≤ 1/accuracy, not value error; the
    value-space tolerance here is the property downstream feature
    binning actually cares about.
    """
    probs = list(probabilities)
    agg = df.agg(
        *[
            F.expr(f"percentile({col}, {p})").alias(f"_e{i}")
            for i, p in enumerate(probs)
        ],
        *[
            F.percentile_approx(col, p, accuracy).alias(f"_a{i}")
            for i, p in enumerate(probs)
        ],
    )
    # single aggregation job; the one result row unrolls to one row per
    # probability via inline (no re-aggregation per quantile)
    rows = F.array(*[
        F.struct(
            F.lit(p).alias("p"),
            F.round(F.col(f"_e{i}"), 4).alias("exact_value"),
            (
                F.abs(F.col(f"_a{i}") - F.col(f"_e{i}"))
                <= F.lit(relative_tolerance)
                * F.greatest(F.abs(F.col(f"_e{i}")), F.lit(1e-9))
            ).alias("within_tolerance"),
        )
        for i, p in enumerate(probs)
    ])
    return agg.select(F.inline(rows))


def frequent_items_check(
    df: DataFrame,
    col: str,
    k: int = 10,
    capacity: int = 64,
) -> DataFrame:
    """Heavy hitters: exact top-k cross-checked against a distributed
    frequent-items sketch.

    The sketch is the partial-top-k pattern: each partition counts its
    own values (vectorized ``value_counts`` per Arrow batch) and emits
    only its ``capacity`` most frequent as (item, count) rows; summaries
    merge downstream by summation. An item absent from a partition's
    summary has partition count ≤ n_p/capacity (the truncation cutoff
    can't exceed it, else the kept counts would sum past n_p), so an
    item absent from EVERY summary has true count ≤ n/capacity — any
    item above that bound is guaranteed present in the merged sketch.
    Memory per task is O(distinct values per partition) during counting
    and O(capacity) on the wire.

    Output: one row per exact-top-``k`` item (ordered by count desc,
    then item) with its exact count and ``ok`` — TRUE when the item is
    either below the guarantee bound or found in the sketch. By the
    bound above every row is deterministically TRUE; a FALSE row means
    the sketch implementation is broken, which is exactly what the
    oracle comparison (constant TRUE) detects. At production scale
    callers skip the exact branch and keep the merged sketch.
    """
    import pandas as pd

    cap = int(capacity)
    if cap <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")

    vals = df.select(F.col(col).cast("string").alias("_v")).where(
        F.col("_v").isNotNull())

    def _summaries(batches):
        from collections import Counter

        c: Counter = Counter()
        for pdf in batches:
            c.update(pdf["_v"].value_counts().to_dict())
        top = c.most_common(cap)
        yield pd.DataFrame(
            {"_v": [t for t, _ in top], "_c": [n for _, n in top]})

    sketch = (
        vals.mapInPandas(_summaries, "_v string, _c long")
        .groupBy("_v").agg(F.sum("_c").alias("_approx"))
    )
    exact = vals.groupBy("_v").agg(F.count(F.lit(1)).alias("exact_cnt"))
    # total rows as a lazy 1-row broadcast derived from the exact
    # aggregate (no separate count() action / extra scan of the input)
    total = exact.agg(F.sum("exact_cnt").alias("_total"))
    topk = exact.orderBy(F.desc("exact_cnt"), F.asc("_v")).limit(int(k))
    return (
        topk.join(sketch, "_v", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("_v").alias("item"),
            "exact_cnt",
            (
                (F.col("exact_cnt") <= F.col("_total") / cap)
                | F.col("_approx").isNotNull()
            ).alias("ok"),
        )
        .orderBy(F.desc("exact_cnt"), F.asc("item"))
    )


def iqr_bounds(
    df: DataFrame, col: str, k: float = 1.5
) -> DataFrame:
    """One-row relation with Tukey fences for ``col``:
    ``(q1, q3, lo, hi)`` where ``lo/hi = q1/q3 ∓/± k·IQR``.

    Uses the EXACT continuous percentile (one aggregate; at 100 TB swap
    in ``percentile_approx`` — same shape, mergeable sketch) so an
    independent engine recomputes the fences bit-for-bit
    (``quantile_cont`` in DuckDB interpolates identically).
    """
    q1 = F.percentile(F.col(col), F.lit(0.25))
    q3 = F.percentile(F.col(col), F.lit(0.75))
    return df.agg(q1.alias("q1"), q3.alias("q3")).select(
        "q1", "q3",
        (F.col("q1") - k * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + k * (F.col("q3") - F.col("q1"))).alias("hi"),
    )


def filter_outliers_iqr(
    df: DataFrame, col: str, k: float = 1.5, keep_nulls: bool = False
) -> DataFrame:
    """Drop rows whose ``col`` falls outside the Tukey fences
    (``[q1 - k·IQR, q3 + k·IQR]``) — the standard numeric-column scrub
    of a data-cleaning pipeline.

    The one-row fence relation broadcasts through a crossJoin, so the
    corpus pass is map-only after the single percentile aggregate.
    NULL values are dropped by default (they fail the between) —
    ``keep_nulls=True`` passes them through for downstream imputation.
    """
    fences = iqr_bounds(df, col, k).select(
        F.col("lo").alias("_lo"), F.col("hi").alias("_hi"))
    inside = F.col(col).between(F.col("_lo"), F.col("_hi"))
    if keep_nulls:
        inside = inside | F.col(col).isNull()
    return (
        df.crossJoin(F.broadcast(fences))
        .where(inside)
        .drop("_lo", "_hi")
    )


def bitmap_distinct_count(df: DataFrame, col: str) -> DataFrame:
    """EXACT distinct count of an integral key via Spark's bitmap
    aggregates (one row, column ``distinct_cnt``).

    ``count(DISTINCT k)`` re-shuffles the fact table on the key; the
    bitmap path instead folds each key into one bit of a per-bucket
    32 KiB bitmap (``bitmap_bucket_number`` / ``bitmap_bit_position``),
    builds the bucket bitmaps with a map-side-combining aggregate, and
    sums per-bucket popcounts. Shuffle volume collapses from every key
    occurrence to ≤ one 32 KiB blob per (bucket × partition) — the
    dense-int analogue of HLL but exact, the right tool for id spaces
    like user/order keys at 100 TB.
    """
    dt = dict(df.dtypes).get(col)
    if dt not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"bitmap_distinct_count needs an integral column, got "
            f"{col}={dt!r} (bitmap_bit_position is integer-keyed); use "
            f"distinct_count_check (HLL) for other types")
    per_bucket = (
        df.select(
            F.bitmap_bucket_number(F.col(col)).alias("_bucket"),
            F.bitmap_bit_position(F.col(col)).alias("_pos"),
        )
        .groupBy("_bucket")
        .agg(F.bitmap_count(F.bitmap_construct_agg(F.col("_pos"))).alias("_cnt"))
    )
    return per_bucket.agg(F.sum("_cnt").cast("long").alias("distinct_cnt"))


def histogram_equi_width(
    df: DataFrame,
    col: str,
    buckets: int = 20,
    scale: int = 100,
) -> DataFrame:
    """Equi-width histogram with ENGINE-EXACT bucket boundaries.

    Float bucket math (``floor((x - min) * nb / (max - min))``) puts
    boundary values on different sides in different engines (one ulp in
    the division flips a bucket) — so the value is first fixed-pointed
    to ``round(x · scale)`` integer units and every boundary computed in
    64-bit integer arithmetic: ``floor((v - vmin) · nb / (vmax - vmin
    + 1))``, exactly reproducible anywhere. Two passes: a one-row
    min/max agg broadcast back over the scan (same shape as
    :func:`filter_outliers_iqr`), then a map-side-combining groupBy on
    the bucket id — no sort, no shuffle of raw values.

    Returns (bucket, lo, hi, cnt) in original value units, lo/hi the
    inclusive-exclusive fixed-point bounds of the bucket.
    """
    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    v = F.round(F.col(col) * scale).cast("long")
    fenced = df.where(F.col(col).isNotNull()).select(v.alias("_v"))
    rng = fenced.agg(
        F.min("_v").alias("_vmin"), F.max("_v").alias("_vmax"))
    # DIV keeps the bucket id in 64-bit integer math end to end —
    # floor(a*b/c) via `/` goes through a double whose 53-bit mantissa
    # can flip a boundary bucket once a*b exceeds 2^53 (all operands
    # are non-negative here, so truncation == floor)
    bucket = F.expr(f"((_v - _vmin) * {int(buckets)}) DIV (_vmax - _vmin + 1)")
    return (
        fenced.crossJoin(F.broadcast(rng))
        .groupBy(bucket.cast("int").alias("bucket"),
                 F.col("_vmin"), F.col("_vmax"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            ((F.col("_vmin")
              + F.expr(f"(bucket * (_vmax - _vmin + 1)) DIV {int(buckets)}"))
             / scale).alias("lo"),
            ((F.col("_vmin")
              + F.expr(f"((bucket + 1) * (_vmax - _vmin + 1)) DIV {int(buckets)}"))
             / scale).alias("hi"),
            "cnt",
        )
    )


def mad_outlier_check(
    df: DataFrame,
    col: str,
    group_col: str | None = None,
    k: float = 3.0,
) -> DataFrame:
    """Median-absolute-deviation outlier census (robust z-score).

    Flags ``|x - median| > k · 1.4826 · MAD`` — the robust analogue of
    the ±kσ rule (1.4826 rescales MAD to σ under normality), immune to
    the outliers themselves inflating the fence the way mean/stddev do.
    Two exact-percentile passes (median, then median of absolute
    deviations) with the one-row result broadcast back, then a map-only
    flag + count — same engine-exact continuous-percentile semantics the
    IQR scrub relies on. Returns per-``group_col`` (or global) rows:
    total, n_outliers, fence.
    """
    med_row = df.agg(F.percentile(F.col(col), F.lit(0.5)).alias("_med"))
    with_med = df.crossJoin(F.broadcast(med_row))
    mad_row = with_med.agg(
        F.percentile(F.abs(F.col(col) - F.col("_med")), F.lit(0.5))
        .alias("_mad"))
    fence = F.lit(k) * F.lit(1.4826) * F.col("_mad")
    flagged = with_med.crossJoin(F.broadcast(mad_row)).select(
        *( [F.col(group_col)] if group_col else [] ),
        (F.abs(F.col(col) - F.col("_med")) > fence).alias("_out"),
        fence.alias("_fence"),
    )
    keys = [group_col] if group_col else []
    return (
        flagged.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.col("_out").cast("int")).alias("n_outliers"),
            F.first("_fence").alias("fence"),
        )
    )


def chi_square_independence(
    df: DataFrame,
    col_a: str,
    col_b: str,
) -> DataFrame:
    """Pearson chi-square independence statistic for two categorical
    columns (one row: chi2, dof, n) — the curation dashboard's
    "is language mix independent of source?" test.

    One contingency aggregate over one scan; marginals re-aggregate the
    cell counts (never the fact table), the expected-count join
    broadcasts the two marginal relations. Only OBSERVED cells ever
    materialize — an unobserved cell's exact contribution is
    ``(0−e)²/e = e``, and since expected counts sum to ``n`` over the
    full grid, the dense statistic is recovered sparsely as
    ``Σ_obs (o−e)²/e + (n − Σ_obs e)`` without enumerating the grid.
    dof = (|A|−1)(|B|−1) over observed category counts.
    """
    cells = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("_o"))
    ra = cells.groupBy(col_a).agg(F.sum("_o").alias("_ra"))
    rb = cells.groupBy(col_b).agg(F.sum("_o").alias("_rb"))
    n = cells.agg(
        F.sum("_o").alias("_n"),
        F.countDistinct(col_a).alias("_na"),
        F.countDistinct(col_b).alias("_nb"))
    e = F.col("_ra") * F.col("_rb") / F.col("_n")
    joined = (
        cells.join(F.broadcast(ra), col_a)
        .join(F.broadcast(rb), col_b)
        .crossJoin(F.broadcast(n))
    )
    return joined.agg(
        (F.sum((F.col("_o") - e) * (F.col("_o") - e) / e)
         + (F.first("_n") - F.sum(e))).alias("chi2"),
        ((F.first("_na") - 1) * (F.first("_nb") - 1)).cast("long")
        .alias("dof"),
        F.first("_n").cast("long").alias("n"),
    )


def mergeable_distinct_rollup(
    df: DataFrame,
    key_col: str,
    bucket_col,
    tolerance: float = 0.05,
    lg_k: int = 12,
) -> DataFrame:
    """Incremental distinct-count maintenance via Apache DataSketches
    HLL: per-bucket sketches built once, UNIONED (not recomputed) for
    the total, plus an accuracy check against the exact value.

    This is the maintenance pattern exact distinct cannot offer: at
    100 TB you materialize per-day (bucket) sketches as they land and
    answer "distinct users this month/quarter/ever" by merging fixed-
    size sketch blobs — no rescan of history, no re-shuffle of keys.
    One row: n_buckets, merged estimate, exact, within_tolerance. The
    exact branch exists for verification; production keeps the sketch.
    """
    per_bucket = (
        df.select(F.col(key_col).alias("_k"), bucket_col.alias("_b"))
        .groupBy("_b")
        .agg(F.hll_sketch_agg(F.col("_k"), F.lit(lg_k)).alias("_sk"))
    )
    merged = per_bucket.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("_sk"))).alias("approx_distinct"),
    )
    exact = df.agg(F.countDistinct(key_col).alias("exact_distinct"))
    return (
        merged.crossJoin(F.broadcast(exact))
        .select(
            "n_buckets",
            F.col("approx_distinct").cast("long").alias("approx_distinct"),
            "exact_distinct",
            (
                F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
                <= F.lit(tolerance) * F.col("exact_distinct")
            ).alias("within_tolerance"),
        )
    )


def sliding_distinct_rollup(
    df: DataFrame,
    key_col: str,
    bucket_col,
    window_buckets: int = 7,
    tolerance: float = 0.05,
    lg_k: int = 12,
) -> DataFrame:
    """Sliding-window distinct counts from per-bucket HLL sketches:
    each bucket (day) answers "distinct keys over the trailing N
    buckets" by UNIONING N fixed-size sketch blobs over a RANGE window
    — history is never rescanned and keys never re-shuffled, which is
    what makes a trailing-28-day DAU/WAU/MAU board tractable at 100 TB
    (exact sliding distinct would re-shuffle every key into every
    window it touches).

    The RANGE frame runs on an integer bucket index (datediff from the
    min bucket), so gaps in the bucket sequence still bound the window
    by TIME, not by row position. The exact branch — each key smeared
    to the windows it lands in, then distinct-counted — exists for
    verification; production keeps the sketches.
    """
    from pyspark.sql import Window

    keyed = df.select(
        F.col(key_col).alias("_k"), bucket_col.cast("date").alias("_b"))
    base = keyed.agg(F.min("_b").alias("_b0"))
    idx = (
        keyed.crossJoin(F.broadcast(base))
        .select("_k", "_b", F.datediff("_b", "_b0").alias("_i")))
    per_bucket = idx.groupBy("_b", "_i").agg(
        F.hll_sketch_agg(F.col("_k"), F.lit(lg_k)).alias("_sk"))
    w = (Window.orderBy("_i")
         .rangeBetween(-(window_buckets - 1), 0))
    slid = per_bucket.select(
        "_b",
        F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk")).over(w))
        .cast("long").alias("approx_distinct"))
    # exact verification: smear each (key, bucket) to every window end
    # it falls inside, cap at the observed bucket range, distinct-count
    smear = (
        idx.select(
            "_k",
            F.explode(F.sequence(
                F.col("_i"),
                F.col("_i") + F.lit(window_buckets - 1))).alias("_wi"))
        .distinct())
    ends = per_bucket.select("_b", F.col("_i").alias("_wi"))
    exact = (
        smear.join(ends, "_wi")
        .groupBy("_b")
        .agg(F.countDistinct("_k").alias("exact_distinct")))
    return (
        slid.join(exact, "_b")
        .select(
            F.col("_b").cast("string").alias("bucket"),
            "approx_distinct", "exact_distinct",
            (F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
             <= F.lit(tolerance) * F.col("exact_distinct"))
            .alias("within_tolerance"))
    )


def kmv_intersect_check(
    df: DataFrame,
    group_a: str,
    group_b: str,
    key_col: str = "user_id",
    group_col: str = "event_type",
    k: int = 256,
) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) distinct sketches for two
    groups, plus the set operation HLL can't do: an INTERSECTION
    estimate, checked against the exact overlap.

    The sketch of a group is its k smallest distinct key hashes; with
    uniform hashes normalized to [0,1), ``D ≈ (k-1)/x_k`` (the classic
    KMV estimator). Because a value hashes identically everywhere, the
    union sketch is just the k smallest of the two sketches' union, and
    the Jaccard of the two groups is the fraction of the union sketch
    present in BOTH input sketches — so ``D_∩ ≈ J · D_∪`` falls out of
    set algebra on 2k rows. HLL registers can't be intersected;
    bottom-k sketches can, which is why engines (DataSketches theta,
    Presto) keep both.

    Scale: distinct (group, key) pairs reduce map-side first; the
    bottom-k then runs as TWO bounded window passes — k per
    (group, 64-salt) partition, then k per group over ≤64k survivors —
    never a single-partition sort of a whole group's keys. Everything
    downstream operates on ≤2k rows per group. The hash is the
    md5-derived portable 60-bit hash, so an external SQL oracle
    replays the sketch bit-for-bit (functions/text.py:25).

    Output: one row ``(group_a, group_b, est_a, est_b, est_union,
    est_intersect, exact_a, exact_b, exact_intersect)``.
    """
    from pyspark.sql import Window

    from bigdata_tag_system_spark.functions.text import portable_hash60

    two = df.where(F.col(group_col).isin(group_a, group_b))
    pairs = (
        two.select(F.col(group_col).alias("_g"),
                   F.col(key_col).cast("string").alias("_key"))
        .distinct()
        .select("_g", portable_hash60(F.col("_key")).alias("_h"))
    )
    w_salt = Window.partitionBy("_g", F.pmod(F.col("_h"), F.lit(64))) \
        .orderBy("_h")
    w_g = Window.partitionBy("_g").orderBy("_h")
    sketch = (
        pairs.withColumn("_rn", F.row_number().over(w_salt))
        .where(F.col("_rn") <= k).drop("_rn")
        .withColumn("_rn", F.row_number().over(w_g))
        .where(F.col("_rn") <= k)
    )
    scale = float(1 << 60)
    per_g = sketch.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_n"),
        F.max("_h").alias("_kth"),
        F.collect_set("_h").alias("_hs"),
    ).select(
        "_g", "_hs",
        # fewer than k distinct keys → the sketch IS the set: exact
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(scale) / F.col("_kth"))
        .alias("_est"),
    # the ≤2-row per-group sketch feeds FOUR consumers (each group's
    # seeded relation is read by the union-merge explode AND the
    # estimate broadcast) — lazy-checkpoint so the distinct → salted
    # bottom-k windows → collect_set chain runs once, not four times
    ).localCheckpoint(eager=False)
    # seed each requested group with a guaranteed row: a group with no
    # rows in df must report est 0.0 / empty sketch, not annihilate the
    # whole report through the 1-row cross joins below (reviewed r5)
    def _seeded(group_name):
        seed = df.sparkSession.range(1).select(
            F.lit(group_name).alias("_g"))
        return seed.join(per_g, "_g", "left").select(
            "_g",
            F.coalesce("_hs", F.array().cast("array<bigint>")).alias("_hs"),
            F.coalesce("_est", F.lit(0.0)).alias("_est"),
        )

    a = _seeded(group_a)
    b = _seeded(group_b)
    merged = (
        a.select(F.explode("_hs").alias("_h"), F.lit(1).alias("_in_a"),
                 F.lit(0).alias("_in_b"))
        .unionByName(
            b.select(F.explode("_hs").alias("_h"), F.lit(0).alias("_in_a"),
                     F.lit(1).alias("_in_b")))
        .groupBy("_h").agg(
            F.max("_in_a").alias("_ia"), F.max("_in_b").alias("_ib"))
    )
    # union k-min over ≤2k rows: a bounded single-row aggregate (no
    # global window) — sort the merged hashes, slice k, fold membership
    arr = F.slice(
        F.array_sort(F.collect_list(
            F.struct(F.col("_h"), (F.col("_ia") * F.col("_ib")).alias("_both"))
        )), 1, k)
    union_stats = merged.agg(arr.alias("_arr")).select(
        F.size("_arr").alias("_un"),
        # try_: an EMPTY union sketch (both groups absent) must yield
        # NULL here, not an ANSI array-index error; the _ukth branch is
        # only taken when _un >= k > 0 anyway
        F.try_element_at("_arr", F.lit(-1))["_h"].alias("_ukth"),
        F.aggregate(
            "_arr", F.lit(0),
            lambda acc, x: acc + x["_both"]).alias("_nboth"),
    ).select(
        "_nboth",
        F.when(F.col("_un") < k, F.col("_un").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(scale) / F.col("_ukth"))
        .alias("_est_u"),
        F.col("_un").cast("double").alias("_usize"),
    ).crossJoin(F.broadcast(
        a.select(F.round("_est", 2).alias("est_a"))
    )).crossJoin(F.broadcast(
        b.select(F.round("_est", 2).alias("est_b"))
    ))
    exact = (
        two.select(F.col(key_col).alias("_key"), F.col(group_col).alias("_g"))
        .distinct()
        .groupBy("_key")
        .agg(
            F.max(F.when(F.col("_g") == group_a, 1).otherwise(0)).alias("_ia"),
            F.max(F.when(F.col("_g") == group_b, 1).otherwise(0)).alias("_ib"),
        )
        .agg(
            F.coalesce(F.sum("_ia"), F.lit(0)).cast("long").alias("exact_a"),
            F.coalesce(F.sum("_ib"), F.lit(0)).cast("long").alias("exact_b"),
            F.coalesce(F.sum(F.col("_ia") * F.col("_ib")), F.lit(0))
            .cast("long").alias("exact_intersect"),
        )
    )
    return (
        union_stats.crossJoin(F.broadcast(exact))  # all 1-row relations
        .select(
            F.lit(group_a).alias("group_a"),
            F.lit(group_b).alias("group_b"),
            "est_a", "est_b",
            F.round("_est_u", 2).alias("est_union"),
            # empty union sketch (both groups absent): 0/0 would NULL out
            F.when(F.col("_usize") == 0, F.lit(0.0))
            .otherwise(F.round(
                F.col("_nboth") / F.col("_usize") * F.col("_est_u"), 2))
            .alias("est_intersect"),
            "exact_a", "exact_b", "exact_intersect",
        )
    )


def cms_build(
    df: DataFrame,
    key: str,
    width: int = 256,
    depth: int = 3,
    partition_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of the frequency of ``df[key]`` (Cormode &
    Muthukrishnan 2005): ``depth`` hash rows × ``width`` counters;
    row ``i``'s counter for a key sits at the portable double-hash
    position (``functions/text.py:portable_hash_pair``), so an external
    SQL oracle replays the sketch — collisions included — bit-for-bit.

    Output is the SPARSE relation ``(row_i, bucket, cnt)`` (plus
    ``partition_col`` if given): at most ``depth × width`` rows per
    partition value regardless of input size, built by one map-side-
    combining groupBy. Sketches MERGE by adding counters —
    :func:`cms_merge` — which is the whole point at 100 TB: build one
    tiny sketch per day/partition as data lands, then answer frequency
    queries over any partition union without rescanning history.

    Guarantees per key (N rows total): ``est ≥ true`` always, and
    ``est ≤ true + 2N/width`` with probability ``1 - (1/2)^depth``.
    """
    from bigdata_tag_system_spark.functions.text import portable_hash_pair

    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    h1, h2 = portable_hash_pair(F.col(key).cast("string"), width)
    keyed = df.where(F.col(key).isNotNull()) \
        .withColumn("_h1", h1).withColumn("_h2", h2)
    rows = keyed.select(
        *([partition_col] if partition_col else []),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row_i"),
                (F.col("_h1") + F.lit(i) * F.col("_h2"))
                .bitwiseAND(F.lit(width - 1)).alias("bucket"),
            )
            for i in range(depth)
        ])).alias("_pos"),
    ).select(
        *([partition_col] if partition_col else []),
        "_pos.row_i", "_pos.bucket",
    )
    group = ([partition_col] if partition_col else []) + ["row_i", "bucket"]
    return rows.groupBy(*group).agg(F.count(F.lit(1)).alias("cnt"))


def cms_merge(cms: DataFrame) -> DataFrame:
    """Merge per-partition sketches by summing counters (drops any
    extra partition columns). Associative and commutative — the
    mergeability contract that lets sketches roll up day→month→year
    without touching the underlying rows."""
    return cms.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    probe: DataFrame,
    key: str,
    width: int = 256,
    depth: int = 3,
) -> DataFrame:
    """Point-frequency estimates for ``probe[key]`` against a (merged)
    sketch: est = min over the ``depth`` rows of the key's counter.

    ``probe`` keys should be distinct (estimates are per key). The
    sketch side is ≤ depth×width rows → broadcast; the probe explodes
    to ``depth`` rows per key, joins map-side, and re-aggregates on the
    probe key — no shuffle of anything proportional to the fact table.
    A key whose bucket was never touched gets est = 0.
    """
    from bigdata_tag_system_spark.functions.text import portable_hash_pair

    h1, h2 = portable_hash_pair(F.col(key).cast("string"), width)
    pos = probe.withColumn("_h1", h1).withColumn("_h2", h2).select(
        *probe.columns,
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("row_i"),
                (F.col("_h1") + F.lit(i) * F.col("_h2"))
                .bitwiseAND(F.lit(width - 1)).alias("bucket"),
            )
            for i in range(depth)
        ])).alias("_pos"),
    ).select(*probe.columns, "_pos.row_i", "_pos.bucket")
    joined = pos.join(F.broadcast(cms), ["row_i", "bucket"], "left")
    return joined.groupBy(*probe.columns).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))


def histogram_rollup_quantiles(
    df: DataFrame,
    col: str,
    partition_col: str,
    lo: float,
    hi: float,
    buckets: int = 64,
    scale: int = 100,
    qs: Sequence[tuple[int, int]] = ((1, 2), (9, 10), (99, 100)),
) -> DataFrame:
    """Quantile estimates from MERGED per-partition histogram sketches
    — the mergeable-quantiles pattern (t-digest/KLL shape) with
    engine-exact arithmetic end to end.

    The key design difference from :func:`histogram_equi_width`:
    bucket geometry is FIXED by caller-supplied ``[lo, hi]`` fences,
    not data-dependent min/max — that is what makes per-partition
    histograms mergeable by counter addition (day→month→year rollups
    with no raw-value rescan; two histograms over different days share
    the same buckets). Out-of-range values clamp into the edge
    buckets, so the estimate degrades loudly at the fences instead of
    breaking mergeability.

    All positioning is integer: values fixed-pointed at ``scale``,
    bucket ids by 64-bit ``DIV``, target ranks as ``ceil(N·num/den)``
    from RATIONAL quantiles (no float rank), estimate = bucket
    midpoint. The exact quantile (both engines' linear-interpolation
    ``percentile``) rides along with an error bound: the midpoint sits ≤ w/2
    from any value in its bucket, and linear interpolation can add up
    to the local data spacing — so the checked bound is one full
    bucket width ``w`` (tight in practice: a rank landing at a bucket
    edge with interpolation across a spacing gap).

    Output per quantile: ``(q_num, q_den, est, exact, within_w)``.
    """
    from pyspark.sql import Window

    if buckets <= 0:
        raise ValueError(f"buckets must be positive, got {buckets}")
    lo_fp, hi_fp = int(round(lo * scale)), int(round(hi * scale))
    if hi_fp <= lo_fp:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    span = hi_fp - lo_fp + 1
    v = F.round(F.col(col) * scale).cast("long")
    clamped = F.greatest(F.least(v, F.lit(hi_fp)), F.lit(lo_fp))
    bucket = F.expr(
        f"least(greatest(((_v - {lo_fp}) * {int(buckets)}) DIV {span}, 0), "
        f"{int(buckets) - 1})")
    per_part = (
        df.where(F.col(col).isNotNull())
        .select(F.col(partition_col).alias("_p"), clamped.alias("_v"))
        .groupBy("_p", bucket.cast("int").alias("_b"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    merged = per_part.groupBy("_b").agg(F.sum("_c").alias("_c"))
    # cumulative over ≤`buckets` rows — bounded by construction
    cum = merged.withColumn(
        "_cum", F.sum("_c").over(
            Window.orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    n1 = merged.agg(F.sum("_c").alias("_n"))
    want = F.explode(F.array(*[
        F.struct(F.lit(num).alias("q_num"), F.lit(den).alias("q_den"))
        for num, den in qs
    ])).alias("_q")
    targets = n1.select(want, "_n").select(
        "_q.q_num", "_q.q_den", "_n",
        F.expr("(_n * q_num + q_den - 1) DIV q_den").alias("_rank"))
    hit = (
        targets.join(F.broadcast(cum), F.col("_cum") >= F.col("_rank"))
        .groupBy("q_num", "q_den")
        .agg(F.min("_b").alias("_hb"))
    )
    exact = df.where(F.col(col).isNotNull()).agg(*[
        F.expr(f"percentile({col}, {num}/{den})")
        .alias(f"_x_{num}_{den}")
        for num, den in qs
    ])
    est_fp = (F.lit(lo_fp)
              + F.expr(f"((2 * _hb + 1) * {span}) DIV {2 * int(buckets)}"))
    w_tol = span / (float(buckets) * scale)
    out = hit.crossJoin(F.broadcast(exact)).select(
        "q_num", "q_den",
        (est_fp / F.lit(float(scale))).alias("est"),
        F.expr(
            "CASE " + " ".join(
                f"WHEN q_num = {num} AND q_den = {den} "
                f"THEN _x_{num}_{den}" for num, den in qs)
            + " END").alias("exact"),
    )
    return out.select(
        "q_num", "q_den", "est",
        F.round("exact", 4).alias("exact"),
        (F.abs(F.col("est") - F.col("exact")) <= F.lit(w_tol))
        .alias("within_w"),
    ).orderBy("q_num", "q_den")


# ---------------------------------------------------------------------------
# Portable HyperLogLog (explicit registers, oracle-replayable)
# ---------------------------------------------------------------------------

def hll_register_sketch(
    df: DataFrame,
    col: str,
    b: int = 8,
    group_col: str | None = None,
) -> DataFrame:
    """HyperLogLog readout with EXPLICIT registers: estimate, exact
    distinct, and an md5 digest of the full register vector — one row
    globally, or one row per ``group_col`` value (the per-day /
    per-source rollup shape: grouped register vectors MERGE by
    register-wise max, so any union of groups re-estimates without
    rescanning rows).

    Spark already ships HLL++ (``approx_count_distinct``), but its
    registers are opaque — nothing outside the JVM can audit them.
    This variant builds the registers from the portable md5-60 hash
    (functions.text.portable_hash60), so an independent SQL engine
    replays the ENTIRE sketch byte-for-byte: register index = low
    ``b`` bits, rho = leading-zero count of the remaining 60-b bits
    + 1 (computed as bit-length arithmetic on the integer, no float
    log), estimate = the standard alpha*m^2/Z with Z kept as an
    EXACT integer numerator (sum of powers of two <= 2^61, inside
    int64) and exactly one float divide at the end — bit-identical
    IEEE across engines.

    Scale: one map-side-combinable groupBy over (register) — m <= 2^b
    groups — then a single-row rollup. The register vector (m rows)
    is tiny by construction; no collect of data rows anywhere.
    Reference has no sketch subsystem; this generalizes its
    count-style readouts (src/engine/tag_computer.py) to the
    mergeable-sketch pattern a 100 TB profile store needs.

    Estimator note: emits the RAW HLL estimator (no small-range
    linear-counting branch — that needs ln(), whose libm rounding
    is not contractually identical across engines). The zero-register
    count rides along so a caller can apply any correction they like.
    """
    from bigdata_tag_system_spark.functions.text import portable_hash60

    m = 1 << b
    wbits = 60 - b
    rho_max = wbits + 1
    h = portable_hash60(F.col(col).cast("string"))
    w = F.expr(f"_h DIV {m}")

    g = F.col(group_col) if group_col else F.lit("_all")
    hashed = df.where(F.col(col).isNotNull()).select(
        g.alias("_g"), h.alias("_h"), F.col(col).alias("_k"))
    regs = (
        hashed
        .select(
            "_g",
            F.pmod(F.col("_h"), F.lit(m)).alias("_reg"),
            F.when(w == 0, F.lit(rho_max))
            .otherwise(F.lit(rho_max) - F.length(F.bin(w)))
            .alias("_rho"),
            "_k")
        .groupBy("_g", "_reg")
        .agg(F.max("_rho").alias("_m")))

    # Z_int = sum over ALL m registers of 2^(rho_max - M_j); absent
    # registers carry M_j = 0. pow(2, k) for integer k <= 53 is an
    # exact IEEE double in every engine; the cast back to long is
    # therefore exact too.
    present = regs.groupBy("_g").agg(
        F.count(F.lit(1)).alias("_hit"),
        F.sum(F.expr(f"CAST(pow(2.0, {rho_max} - _m) AS BIGINT)"))
        .alias("_zp"),
        F.md5(F.array_join(F.array_sort(F.collect_list(
            F.concat_ws(":", F.lpad(F.col("_reg").cast("string"), 3, "0"),
                        F.col("_m").cast("string")))), ",")).alias("regs_md5"))
    exact = hashed.groupBy("_g").agg(
        F.count_distinct(F.col("_k")).alias("exact_distinct"))

    # e0-suffixed literals parse as DOUBLE in BOTH Spark and DuckDB —
    # a bare 0.7213 is DECIMAL in each engine's ANSI dialect, and
    # decimal division scale rules differ across engines
    alpha_expr = "(0.7213e0 / (1.0e0 + 1.079e0 / {m}.0e0))".format(m=m)
    # global mode keeps its one-row contract even on EMPTY input (all
    # registers zero) via a seed row; grouped mode emits only observed
    # groups (an absent group has no meaningful register vector)
    if group_col is None:
        base = df.sparkSession.range(1).select(F.lit("_all").alias("_g"))
    else:
        base = hashed.select("_g").distinct()
    joined = (base.join(present, "_g", "left")
              .join(exact, "_g", "left"))
    hit = F.coalesce(F.col("_hit"), F.lit(0).cast("long"))
    z_full = (F.coalesce(F.col("_zp"), F.lit(0).cast("long"))
              + (F.lit(m) - hit) * F.lit(1 << rho_max).cast("long"))
    out = joined.select(
        "_g",
        F.lit(m).cast("long").alias("m"),
        hit.alias("registers_hit"),
        (F.lit(m) - hit).alias("zero_registers"),
        z_full.alias("z_int"),
        F.coalesce(F.col("regs_md5"), F.md5(F.lit(""))).alias("regs_md5"),
        F.coalesce(F.col("exact_distinct"), F.lit(0).cast("long"))
        .alias("exact_distinct"),
    )
    # one float multiply chain + one divide, identical text on both
    # sides: parsed-literal doubles and left-to-right evaluation make
    # the result bit-identical across engines
    est = (f"CAST(FLOOR({alpha_expr} * {m}.0e0 * {m}.0e0 "
           f"* {float(1 << rho_max):.1f}e0 / CAST(z_int AS DOUBLE)) "
           f"AS BIGINT)")
    cols = ([F.col("_g").alias(group_col)] if group_col else []) + [
        F.col("m"), F.col("registers_hit"), F.col("zero_registers"),
        F.col("z_int"), F.expr(est).alias("est_raw"),
        F.col("exact_distinct"), F.col("regs_md5")]
    out = out.select(*cols)
    return out.orderBy(group_col) if group_col else out


def cms_join_size(
    cms_a: DataFrame,
    cms_b: DataFrame,
    depth: int = 3,
) -> DataFrame:
    """Join-cardinality estimate from two Count-Min sketches built on
    the SAME (width, depth, hash family): |R ⋈ S| on the sketched key
    is estimated as min over the ``depth`` rows of the counter inner
    product Σ_bucket a[row,bucket]·b[row,bucket] (Cormode &
    Muthukrishnan's inner-product query; one-sided like the point
    estimate: est ≥ true, error ≤ N_a·N_b/width per row whp).

    This is the planner's question — "how big is this join going to
    be?" — answered from two ≤ depth×width relations WITHOUT touching
    either fact table: sketches built per partition as data lands
    (cms_build/cms_merge) price any prospective join over any
    partition union. Counters are exact integers and the inner product
    widens to decimal(38,0) before the multiply (products of data-scale
    sums wrap int64 past ~3e9 rows), so an external oracle replays the
    estimate exactly; pair it with the exact join count at test scale
    to measure the overestimate.

    Scale shape: the sketch join is (depth×width) × (depth×width) on
    (row_i, bucket) — constant-size work regardless of fact volume.
    """
    # counters are data-scale longs, so the inner product is a product
    # of two data-scale sums — decimal(38,0)-widen BEFORE the multiply
    # (the assortativity/fellegi discipline): Σ c_a·c_b wraps int64
    # past ~3e9-row inputs while the checked-BIGINT oracle errors
    prod = (
        cms_a.select("row_i", "bucket",
                     F.col("cnt").cast("decimal(38,0)").alias("_ca"))
        .join(cms_b.select("row_i", "bucket",
                           F.col("cnt").cast("decimal(38,0)").alias("_cb")),
              ["row_i", "bucket"])
        .groupBy("row_i")
        .agg(F.sum(F.col("_ca") * F.col("_cb"))
             .cast("decimal(38,0)").alias("_ip")))
    # a hash row with NO shared buckets contributes inner product 0 —
    # reinstate missing rows so min() sees them
    rows = F.broadcast(
        prod.sparkSession.range(int(depth)).select(
            F.col("id").cast("int").alias("row_i")))
    return (
        rows.join(prod, "row_i", "left")
        .agg(F.min(F.coalesce(F.col("_ip"),
                              F.lit(0).cast("decimal(38,0)")))
             .alias("est_join_size")))
