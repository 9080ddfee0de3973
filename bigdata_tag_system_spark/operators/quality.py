"""Data-quality expectation checks and referential-integrity audits.

A pipeline feeding a 100 TB store needs its gates expressed as QUERIES,
not notebook spot-checks: each expectation compiles to one aggregate
over a single scan (all expectations for a table share the pass), and
each relationship audit is one anti-join count. Results come back as
rows — (check, violations, ok) — so the gate itself is
oracle-checkable and can run under the same scheduler as everything
else. The shapes mirror dbt tests / Deequ analyzers, built from plain
DataFrame aggregates.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expectation_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    unique: Sequence[str] = (),
    accepted_values: Mapping[str, Sequence] | None = None,
    ranges: Mapping[str, tuple] | None = None,
) -> DataFrame:
    """One row per expectation: (check, violations, ok).

    - ``not_null``: columns that must never be NULL;
    - ``unique``: columns whose values must not repeat (violations =
      rows beyond the first per value, i.e. ``count − countDistinct``
      over non-null values, + nothing for NULLs — pair with not_null);
    - ``accepted_values``: column → allowed set (violations = rows
      outside it, NULL excluded);
    - ``ranges``: column → (lo, hi) inclusive bounds.

    Everything folds into ONE aggregate over one scan — adding an
    expectation adds an aggregate expression, never a pass. The unique
    check's exact ``countDistinct`` is the one expensive entry at
    production scale — swap it for the bitmap/HLL variants in
    ``sketches`` when the column is integral and the gate tolerates it.
    """
    aggs = []
    names = []
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(F.sum(F.col(c).isNull().cast("long")))
    for c in unique:
        names.append(f"unique:{c}")
        aggs.append(
            F.count(F.col(c)) - F.countDistinct(F.col(c)))
    for c, vals in (accepted_values or {}).items():
        names.append(f"accepted:{c}")
        aggs.append(F.sum(
            (~F.col(c).isin(list(vals)) & F.col(c).isNotNull())
            .cast("long")))
    for c, (lo, hi) in (ranges or {}).items():
        names.append(f"range:{c}")
        aggs.append(F.sum(
            ((F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi)))
            .cast("long")))
    if not aggs:
        raise ValueError("expectation_report needs at least one expectation")
    row = df.agg(*[a.alias(f"_e{i}") for i, a in enumerate(aggs)])
    stacked = row.select(F.explode(F.array(*[
        F.struct(
            F.lit(n).alias("check"),
            F.coalesce(F.col(f"_e{i}"), F.lit(0)).cast("long")
            .alias("violations"),
        )
        for i, n in enumerate(names)
    ])).alias("_s")).select("_s.check", "_s.violations")
    return stacked.select(
        "check", "violations", (F.col("violations") == 0).alias("ok"))


def referential_audit(
    relations: Sequence[tuple],
) -> DataFrame:
    """Orphan counts for FK→PK relationships: one row per relation
    ``(name, fact_df, fk_col, dim_df, pk_col)`` with the number of fact
    rows whose key has no match (NULL FKs are not orphans — reject them
    with :func:`expectation_report` if unwanted).

    Each relation is a LEFT ANTI join counted — the join broadcasts the
    dim side when small and degrades to a shuffled hash join otherwise;
    nothing ever materializes beyond a count. Results union into one
    frame so a scheduler treats the whole audit as one query.
    """
    if not relations:
        raise ValueError("referential_audit needs at least one relation")
    outs = []
    for name, fact, fk, dim, pk in relations:
        orphans = (
            fact.select(F.col(fk)).where(F.col(fk).isNotNull())
            .join(dim.select(F.col(pk).alias(fk)).distinct(),
                  on=fk, how="left_anti")
        )
        outs.append(
            orphans.agg(F.count(F.lit(1)).alias("orphans"))
            .select(F.lit(name).alias("relation"), "orphans"))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select(
        "relation", "orphans", (F.col("orphans") == 0).alias("ok"))


def population_stability(
    ref: DataFrame,
    cmp: DataFrame,
    col: str,
    lo: float,
    hi: float,
    buckets: int = 10,
    alpha: float = 0.5,
) -> DataFrame:
    """Population Stability Index between a reference and a comparison
    population of ``col`` — the standard drift gate for a feature or
    score column (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 broken).

    Buckets are FIXED equal-width over ``[lo, hi)`` (values outside
    clamp into the edge buckets) rather than reference deciles: fixed
    cut points make the statistic a pure function of the inputs —
    reproducible by an independent oracle and stable across reruns —
    where sample quantiles would inject engine-specific interpolation.
    Zero counts are Laplace-smoothed (``alpha``) so empty buckets can't
    produce ``ln(0)``.

    Scale: one partial-aggregate bucket count per side (map-side
    combine, ``buckets``-sized results), a generated bucket spine so
    empty buckets appear on both sides, and scalar math on ≤``buckets``
    rows. Two scans, no joins wider than the spine.

    Output: one row per bucket ``(bucket, n_ref, n_cmp, p_ref, p_cmp,
    contrib)``; ``sum(contrib)`` is the PSI.
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    width = (hi - lo) / buckets
    b = F.least(
        F.greatest(
            F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(buckets - 1)).cast("int")

    def _counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.where(F.col(col).isNotNull())
            .select(b.alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    spine = ref.sparkSession.range(buckets).select(
        F.col("id").cast("int").alias("bucket"))
    joined = (
        spine.join(F.broadcast(_counts(ref, "n_ref")), "bucket", "left")
        .join(F.broadcast(_counts(cmp, "n_cmp")), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cmp", F.lit(0)).alias("n_cmp"),
        )
    )
    tot = joined.agg(
        F.sum("n_ref").alias("_tr"), F.sum("n_cmp").alias("_tc"))
    a = F.lit(float(alpha))
    bl = F.lit(float(buckets))
    p_ref = (F.col("n_ref") + a) / (F.col("_tr") + a * bl)
    p_cmp = (F.col("n_cmp") + a) / (F.col("_tc") + a * bl)
    return (
        joined.crossJoin(F.broadcast(tot))
        .select(
            "bucket", "n_ref", "n_cmp",
            F.round(p_ref, 6).alias("p_ref"),
            F.round(p_cmp, 6).alias("p_cmp"),
            F.round((p_ref - p_cmp) * F.log(p_ref / p_cmp), 6)
            .alias("contrib"),
        )
    )


def key_skew_report(
    df: DataFrame,
    key_col: str,
    target_rows_per_task: int = 10_000_000,
    top_n: int = 10,
) -> DataFrame:
    """One-row shuffle-skew diagnosis for a prospective join/groupBy key.

    At 100 TB the single most common cause of a stuck stage is one hot
    key: every row for it lands in one shuffle partition and one task
    runs for hours while 999 executors idle. This audit answers, from
    ONE aggregation pass over (key -> count), the questions you ask
    before shipping that shuffle:

    - ``max_cnt`` / ``skew_x100`` (max over mean, x100): is the
      heaviest key out of line with the typical one?
    - ``topn_share_pct``: do the top ``top_n`` keys own so much of the
      table that salting (or a broadcast of the OTHER side) is
      mandatory?
    - ``rec_salt``: ceil(max_cnt / target_rows_per_task) — the salt
      fan-out that caps the hottest key's per-task row count at the
      target; 1 means no salting needed.

    Everything is integer arithmetic (integer division for the mean,
    x100 fixed-point for ratios), so an external SQL oracle reproduces
    the row byte-for-byte. The per-key counts aggregate map-side
    (partial counts merge associatively); the top-N step sorts only
    the distinct-key relation, never data rows.

    Relation to ``operators.joins.skew_stats``: that helper collects
    (share, top-k) to the DRIVER for an imperative salt-or-broadcast
    decision inside ``adaptive_join``; this one stays a DataFrame —
    schedulable, oracle-checkable, and composable into audit reports.
    """
    counts = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_c")))
    top = (counts.orderBy(F.col("_c").desc(), F.col("_k"))
           .limit(int(top_n))
           .agg(F.sum("_c").alias("_top_c")))
    return (
        counts.agg(
            F.sum("_c").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("_c").alias("max_cnt"))
        .crossJoin(F.broadcast(top))
        .select(
            "n_rows", "n_keys", "max_cnt",
            F.expr("n_rows DIV n_keys").alias("avg_cnt"),
            # vs the floored mean, NOT (max*100*n_keys)/n_rows — that
            # product can exceed int64 at petabyte row counts
            F.expr("(max_cnt * 100) DIV greatest(n_rows DIV n_keys, 1)")
            .alias("skew_x100"),
            F.expr("(_top_c * 100) DIV n_rows").alias("topn_share_pct"),
            F.expr(f"(max_cnt + {int(target_rows_per_task)} - 1) "
                   f"DIV {int(target_rows_per_task)}").alias("rec_salt"),
        ))


def null_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-column completeness/cardinality profile from ONE scan:
    (col_name, n_rows, nulls, null_bp, n_distinct) — the ANALYZE-style
    table profile a catalog keeps per partition-day (dbt
    `dbt_profiler` / Deequ `ColumnProfilerRunner` shape).

    All metrics for all columns compute in a single aggregate pass
    (count + count(col) + count(DISTINCT col) per column), then unroll
    to one row per column via a literal struct array — no per-column
    rescans. Exact distincts here (oracle-comparable at test scale);
    at 100 TB swap ``approx_count_distinct`` — same plan shape, the
    multi-distinct Expand disappears and the pass goes fully
    map-side-combinable.

    ``null_bp`` is integer basis points (nulls·10000 div n_rows; 0
    for an empty table).
    """
    names = list(cols) if cols else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(names):
        aggs.append(F.count(F.col(c)).alias(f"_nn{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"_nd{i}"))
    one = df.agg(*aggs)
    rows = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("_n").alias("n_rows"),
            (F.col("_n") - F.col(f"_nn{i}")).alias("nulls"),
            F.when(F.col("_n") > 0,
                   F.expr(f"((_n - _nn{i}) * 10000) DIV _n"))
            .otherwise(F.lit(0).cast("long")).alias("null_bp"),
            F.col(f"_nd{i}").alias("n_distinct"),
        )
        for i, c in enumerate(names)
    ])
    return one.select(F.inline(rows)).orderBy("col_name")


def ks_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    group_a: str,
    group_b: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between the
    ``value_col`` distributions of two groups — the distribution-shape
    complement to :func:`population_stability` (PSI sees binned mass
    shifts; KS sees the worst-case CDF gap, including shifts inside a
    bin).

    ``D = max over observed v of |F_a(v) − F_b(v)|``, computed EXACTLY
    in integers: per-value counts, a two-level cumulative sum — values
    are range-bucketed (equal-width fences off a 1-row min/max
    aggregate), cumulated per bucket by an ordinary partitioned window,
    then stitched with per-bucket offsets whose own cumulative runs
    over the ≤``n_buckets``-row bucket-total relation (the
    sample_shuffle_order pattern: dense global ECDF with NO
    single-partition window over data rows). The statistic is reported
    in basis points, ``d_bp = (10000 · max|c_a·n_b − c_b·n_a|) DIV
    (n_a·n_b)`` — integer arithmetic end to end, no float hash risk.

    Returns one row: (n_a, n_b, n_values, d_bp).
    """
    from pyspark.sql import Window

    v = F.col(value_col)
    tagged = (
        df.where(F.col(group_col).isin([group_a, group_b])
                 & v.isNotNull())
        .select(v.alias("_v"),
                (F.col(group_col) == group_a).cast("long").alias("_a"))
    )
    g = tagged.groupBy("_v").agg(
        F.sum("_a").alias("_ca"),
        F.sum(F.lit(1) - F.col("_a")).alias("_cb"))
    rng = g.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    bucket = F.when(
        F.col("_hi") == F.col("_lo"), F.lit(0)
    ).otherwise(
        F.least(
            F.lit(n_buckets - 1),
            F.floor((F.col("_v") - F.col("_lo"))
                    / (F.col("_hi") - F.col("_lo")) * n_buckets)
            .cast("int")))
    gb = g.crossJoin(F.broadcast(rng)).withColumn("_b", bucket)
    w = (Window.partitionBy("_b").orderBy("_v")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = gb.select(
        "_b", "_v",
        F.sum("_ca").over(w).alias("_fa"),
        F.sum("_cb").over(w).alias("_fb"))
    btot = gb.groupBy("_b").agg(
        F.sum("_ca").alias("_ta"), F.sum("_cb").alias("_tb"))
    wb = (Window.orderBy("_b")
          .rowsBetween(Window.unboundedPreceding, -1))
    off = btot.select(
        "_b",
        F.coalesce(F.sum("_ta").over(wb), F.lit(0)).alias("_oa"),
        F.coalesce(F.sum("_tb").over(wb), F.lit(0)).alias("_ob"))
    tot = g.agg(F.sum("_ca").alias("n_a"), F.sum("_cb").alias("n_b"),
                F.count(F.lit(1)).alias("n_values"))
    gap = F.abs((F.col("_oa") + F.col("_fa")) * F.col("n_b")
                - (F.col("_ob") + F.col("_fb")) * F.col("n_a"))
    return (
        cum.join(F.broadcast(off), "_b")
        .crossJoin(F.broadcast(tot))
        .agg(F.first("n_a").alias("n_a"), F.first("n_b").alias("n_b"),
             F.first("n_values").alias("n_values"),
             F.max(gap).alias("_m"))
        .select(
            "n_a", "n_b", "n_values",
            F.expr("(10000 * _m) DIV (n_a * n_b)").alias("d_bp"))
    )


def fd_violations(
    df: DataFrame,
    dependencies: Sequence[tuple[Sequence[str], str]],
    name_sep: str = ",",
) -> DataFrame:
    """Functional-dependency audit: for each candidate FD
    ``lhs_cols → rhs_col``, does every LHS key map to exactly ONE
    RHS value? The consistency primitive next to the uniqueness /
    not-null gates in :func:`expectation_report` — schema docs claim
    these dependencies (order → customer, order → date), this measures
    where the data breaks them before a join or an SCD build silently
    fans out.

    One hash aggregate per FD (map-side combinable: count + two
    count-distincts per LHS group, then a one-row rollup), unioned into
    a single report relation — no windows, no joins, nothing
    data-sized on the driver. NULL RHS values count as a value of
    their own (a key mapping to {x, NULL} IS two observed states —
    exactly the inconsistency an FD audit must surface).

    Returns one row per FD: (fd, n_rows, n_keys, n_violating_keys,
    max_rhs_values) — n_violating_keys == 0 means the FD holds.
    """
    if not dependencies:
        raise ValueError("dependencies must be non-empty")
    reports = []
    for lhs, rhs in dependencies:
        lhs = list(lhs)
        label = f"{name_sep.join(lhs)} -> {rhs}"
        # count NULL as an observed state: count(distinct) skips NULLs,
        # so add a has-null flag to the distinct tally
        per_key = df.groupBy(*[F.col(c) for c in lhs]).agg(
            F.count(F.lit(1)).alias("_n"),
            (F.count_distinct(F.col(rhs))
             + F.max(F.col(rhs).isNull().cast("int"))).alias("_d"))
        reports.append(per_key.agg(
            F.lit(label).alias("fd"),
            F.sum("_n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum((F.col("_d") > 1).cast("int")).cast("bigint")
            .alias("n_violating_keys"),
            F.max("_d").cast("bigint").alias("max_rhs_values")))
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    re-identification screen run BEFORE a dataset ships: a row whose
    (quasi-identifier) group holds fewer than ``k`` records is
    re-identifiable by linkage, and those groups must be suppressed or
    generalized. With ``sensitive_col`` the report adds the
    l-diversity reading (distinct sensitive values per group): a group
    can be k-anonymous yet leak the attribute when every member shares
    one sensitive value.

    One hash aggregate over the QI combination + a one-row rollup —
    map-side combinable, nothing data-sized on the driver. Returns one
    row: (k, n_rows, n_groups, n_groups_below_k, rows_at_risk,
    min_group_size[, min_l_diversity]).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    if sensitive_col is not None:
        aggs.append(
            (F.count_distinct(F.col(sensitive_col))
             + F.max(F.col(sensitive_col).isNull().cast("int")))
            .alias("_l"))
    per_group = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(*aggs)
    outs = [
        F.lit(int(k)).alias("k"),
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("_n") < k).cast("int")).cast("bigint")
        .alias("n_groups_below_k"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("bigint").alias("rows_at_risk"),
        F.min("_n").cast("bigint").alias("min_group_size"),
    ]
    if sensitive_col is not None:
        outs.append(F.min("_l").cast("bigint").alias("min_l_diversity"))
    return per_group.agg(*outs)


def conformal_coverage(
    df: DataFrame,
    value_col: str,
    group_col: str,
    key_col: str,
    alpha_pct: int = 90,
    fit_frac: float = 0.8,
    salt: int = 0,
) -> DataFrame:
    """Split-conformal interval calibration (Vovk; Lei et al. JASA'18):
    per group, fit a center (median) and the conformal quantile of the
    absolute nonconformity score on a hash-designated FIT split — the
    finite-sample-valid ``⌈(n+1)·α/100⌉``-th order statistic, pure
    integer rank arithmetic — then measure what fraction of the
    held-out split actually lands inside ``center ± q``. The
    distribution-free answer to "are my per-group intervals honest,"
    with no model and no normality assumption; coverage_bp should read
    ≈ ``100·alpha_pct`` when the groups are exchangeable.

    The split is the engine-portable :func:`~bigdata_tag_system_spark.
    operators.sampling.knuth_hash` fence (rerun/arrival-order
    invariant), the quantile is an exact order statistic picked by a
    PER-GROUP rank window over fit scores (never a global sort), and
    the coverage decision compares floats derived from the same
    doubles on both engines. A group whose fit split is too small for
    the adjusted rank (k > n) gets an infinite interval — covered by
    definition, reported, never dropped.
    """
    from bigdata_tag_system_spark.operators.sampling import knuth_hash
    from pyspark.sql import Window

    fence = int((2**32) * fit_frac)
    v = F.col(value_col).cast("double")
    base = df.select(
        F.col(group_col).alias("_g"), v.alias("_v"),
        (knuth_hash(F.col(key_col), salt) < F.lit(fence))
        .alias("_is_fit"))
    fit = base.where("_is_fit")
    ev = base.where(~F.col("_is_fit"))

    centers = fit.groupBy("_g").agg(
        F.expr(f"percentile(_v, 0.5)").alias("_c"))
    scored = fit.join(F.broadcast(centers), "_g").select(
        "_g", F.abs(F.col("_v") - F.col("_c")).alias("_s"))
    w = Window.partitionBy("_g").orderBy("_s")
    w_all = Window.partitionBy("_g")
    ranked = scored.select(
        "_g", "_s",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_n"))
    # conformal rank k = ceil((n+1)·alpha/100), exact integers
    k = F.expr(f"((_n + 1) * {int(alpha_pct)} + 99) DIV 100")
    q = (ranked.where(F.col("_rn") == k)
         .select("_g", F.col("_s").alias("_q"),
                 F.col("_n").alias("_n_fit")))
    # k > n → no row: LEFT join, null _q = infinite interval
    n_fit = fit.groupBy("_g").agg(F.count(F.lit(1)).alias("_nf"))
    enriched = (ev.join(F.broadcast(centers), "_g")
                .join(F.broadcast(q.drop("_n_fit")), "_g", "left")
                .join(F.broadcast(n_fit), "_g"))
    covered = (F.col("_q").isNull()
               | (F.abs(F.col("_v") - F.col("_c")) <= F.col("_q")))
    return (enriched.groupBy(F.col("_g").alias(group_col))
            .agg(F.max("_nf").cast("long").alias("n_fit"),
                 F.count(F.lit(1)).alias("n_eval"),
                 F.round(F.max("_c"), 4).alias("center"),
                 F.round(F.max("_q"), 4).alias("q_alpha"),
                 F.sum(covered.cast("long")).alias("n_covered"),
                 F.expr("(10000 * sum(CASE WHEN _q IS NULL OR "
                        "abs(_v - _c) <= _q THEN 1 ELSE 0 END)) "
                        "DIV count(1)").alias("coverage_bp"))
            .orderBy(group_col))
