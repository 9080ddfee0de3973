"""Deterministic sampling and dataset-splitting operators.

Training-data pipelines need samples and splits that are (a) stable
under re-runs and repartitioning — a row's fate must depend on its KEY,
never on partition position or RNG state — and (b) stratifiable, so
minority slices keep representation. ``df.sample`` gives neither across
engines/plans; these operators derive every decision from a
deterministic per-key hash.

Two hash flavors:

- :func:`key_hash` (default ``xxhash64``) — best mixing, engine-specific.
- :func:`knuth_hash` — Fibonacci multiplicative hashing
  (``key · 2654435761 mod 2³²``, Knuth TAOCP vol. 3 §6.4). Weaker
  mixing but exactly computable in ANY engine with 64-bit integer
  arithmetic, which makes sampling queries cross-engine verifiable —
  the oracle harness runs the same expression in DuckDB.

At scale every operator here is a narrow map (filter on a hash
expression) or a per-stratum window over the stratum's own partition —
no global sort, no driver-side state, no RNG.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_KNUTH_A = 2654435761          # 2^32 / golden ratio, Knuth's multiplier
_MOD = 4294967296              # 2^32


def knuth_hash(key: Column | str, salt: int = 0) -> Column:
    """Portable multiplicative hash of a non-negative integer key into
    [0, 2³²).

    Sequential keys map to a low-discrepancy (golden-ratio step)
    sequence — equidistributed, so threshold sampling hits fractions
    accurately even on dense id ranges. Exactly reproducible in any
    SQL engine with 64-bit integers:
    ``(((key + salt) % 2147483648) * 2654435761) % 4294967296``.
    The pre-reduction mod 2³¹ bounds the product at ~5.7e18 (< int64
    max), so snowflake-scale ids can't overflow — without it the
    multiply wraps silently in Spark but errors in DuckDB, breaking
    cross-engine reproducibility. Non-integer key columns are rejected
    by the operators (a silent ``cast('long') → NULL`` would route
    every row to the default branch); use :func:`key_hash` for them.
    """
    k = F.col(key) if isinstance(key, str) else key
    k2 = F.pmod(k.cast("long") + F.lit(salt), F.lit(_MOD // 2))
    return F.pmod(k2 * F.lit(_KNUTH_A), F.lit(_MOD))


def key_hash(key: Column | str, salt: int = 0) -> Column:
    """Default sampling hash: xxhash64 folded into [0, 2³²)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(k, F.lit(salt)), F.lit(_MOD))


_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _pick_hash(df: DataFrame, key_col: str, portable: bool):
    """The portable (Knuth) hash silently NULLs out non-integer keys
    (``cast('long')``), which would route every row to one branch —
    reject those up front; the default xxhash64 hashes any type."""
    if not portable:
        return key_hash
    dt = dict(df.dtypes).get(key_col)
    if dt not in _INTEGRAL_TYPES:
        raise ValueError(
            f"portable=True needs an integral key column, got "
            f"{key_col}={dt!r}; use portable=False (xxhash64) for "
            f"non-integer keys")
    return knuth_hash


def sample_fraction(
    df: DataFrame,
    fraction: float,
    key_col: str,
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per key — stable under
    re-runs, repartitioning, and incremental growth (a key once kept is
    always kept, the property plain ``df.sample`` lacks)."""
    h = _pick_hash(df, key_col, portable)(key_col, salt)
    return df.where(h < F.lit(int(fraction * _MOD)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    key_col: str,
    salt: int = 0,
    default_fraction: float = 0.0,
    portable: bool = False,
) -> DataFrame:
    """Per-stratum keep-fractions (e.g. upweight rare languages in a
    corpus sample). A narrow filter — no shuffle, no per-stratum jobs
    (contrast ``sampleBy``'s RNG draw, which is not key-stable)."""
    h = _pick_hash(df, key_col, portable)(key_col, salt)
    thresh = F.lit(int(default_fraction * _MOD))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(frac * _MOD))
        ).otherwise(thresh)
    return df.where(h < thresh)


def train_test_split(
    df: DataFrame,
    key_col: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "validation", "test"),
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Add a ``split`` column assigning each KEY to exactly one split.

    Keyed assignment is the leakage guard: every row of a key (all
    chunks of a document, all events of a user) lands in the same split,
    and the assignment never changes as the dataset grows. Weights
    normalize to 1; boundaries are half-open hash ranges.
    """
    if len(weights) != len(names):
        raise ValueError(f"{len(weights)} weights for {len(names)} names")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum > 0")
    h = _pick_hash(df, key_col, portable)(key_col, salt)
    expr = None
    acc = 0.0
    for w, name in zip(weights, names):
        acc += w / total
        bound = F.lit(min(int(acc * _MOD), _MOD))
        cond = h < bound
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    # float edge: guarantee total coverage
    return df.withColumn("split", expr.otherwise(F.lit(names[-1])))


def weighted_reservoir_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str,
    salt: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis–Spirakis
    A-ES (IPL 2006): each row draws ``u ∈ (0,1)`` from its KEY hash and
    scores ``u^(1/w)``; the k largest scores are a weighted sample
    without replacement — inclusion probability proportional to weight,
    exactly the draw a mixture builder needs when rows (not strata)
    carry the weights.

    Deterministic and distributed by construction: ``u`` derives from
    the portable Knuth hash, so the kept set is a pure function of
    (keys, weights, salt) — re-run-stable, engine-replayable, and
    mergeable (the top-k of a union is the top-k of per-partition
    top-ks, the property that makes A-ES the STREAMING weighted
    reservoir; an incremental batch just re-ranks against the kept
    scores). Ranking uses the equivalent log-space key
    ``ln(u)/w`` (monotone in ``u^(1/w)``, one transcendental, better
    float resolution near score 1), quantized to 9 decimals half-up
    with id tie-break so the kept set cannot flip on a ``log()`` ulp
    between engines. Rows with NULL or non-positive weight are
    excluded (A-ES requires ``w > 0``). Plan: narrow map +
    ``orderBy+limit`` = TakeOrderedAndProject — per-partition heaps,
    no global sort, no RNG state, no driver loop.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    h = _pick_hash(df, key_col, portable)(key_col, salt)
    u = (h + F.lit(0.5)) / F.lit(float(_MOD))
    w = F.col(weight_col).cast("double")
    es = F.floor(F.log(u) / w * 1e9 + 0.5) / 1e9
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("es_key", es)
        .orderBy(F.desc("es_key"), F.col(key_col))
        .limit(int(k))
    )


def topk_per_stratum(
    df: DataFrame,
    strata_col: str,
    n: int,
    key_col: str,
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic pseudo-random ``n`` rows per stratum.

    Rank within each stratum by the key hash (tiebreak on the key) and
    keep rank ≤ n — the distributed replacement for per-stratum
    reservoir sampling: one shuffle on the stratum column, map-side
    partial top-k via the window's rank pushdown, no driver state.
    """
    h = _pick_hash(df, key_col, portable)(key_col, salt)
    w = Window.partitionBy(strata_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )


def shuffle_order(
    df: DataFrame,
    key_col: str,
    salt: int = 0,
    portable: bool = False,
) -> DataFrame:
    """Deterministic global shuffle: every row gets ``shuffle_rank``
    (1-based, dense over the whole dataset), keyed only on the row's
    key — the training-data "shuffle the corpus before sharding" step,
    reproducible across re-runs, engines, and cluster layouts.

    ``orderBy(hash, key)`` is a range-partitioned global sort on an
    8-byte pair: Spark samples hash boundaries, so output partitions are
    balanced regardless of input skew. Changing ``salt`` yields an
    independent permutation (a new epoch order without rewriting data).
    With ``portable=True`` the Knuth hash makes the permutation
    bit-reproducible in any SQL engine (integral keys only).

    ``key_col`` MUST be unique per row (a doc/row id): rows sharing a
    key value tie on the ``(hash, key)`` sort and their relative rank
    would be plan-dependent — determinism holds only because the key
    itself is the final tiebreaker. Deduplicate or synthesize a unique
    key first if the column can repeat.
    """
    num_buckets = 1 << 12
    h = _pick_hash(df, key_col, portable)(key_col, salt)
    # A bare Window.orderBy would move EVERYTHING to one partition. The
    # scalable dense global rank: rank within hash-range buckets (the
    # hash is uniform, so buckets are balanced), then add each bucket's
    # cumulative row offset — a broadcast-sized relation of ≤ 2¹² rows.
    from pyspark.storagelevel import StorageLevel

    hb = df.withColumn("_h", h).withColumn(
        "_b", (F.col("_h") / F.lit(_MOD // num_buckets)).cast("long")
    ).persist(StorageLevel.MEMORY_AND_DISK)  # feeds offsets AND the ranked branch
    within = F.row_number().over(
        Window.partitionBy("_b").orderBy(F.col("_h").asc(), F.col(key_col).asc()))
    offsets = (
        hb.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_b").rowsBetween(
                        Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .select("_b", "_offset")
    )
    return (
        hb.withColumn("_within", within)
        .join(F.broadcast(offsets), "_b")
        .withColumn("shuffle_rank", (F.col("_offset") + F.col("_within")))
        .drop("_h", "_b", "_within", "_offset")
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    total: int,
    portable: bool = False,
    salt: int = 0,
) -> DataFrame:
    """Sqrt-tempered mixture sampling across strata (training-data
    mixing): stratum ``i`` with ``c_i`` rows contributes
    ``floor(total · √c_i / Σ√c_j)`` rows — between proportional
    (temperature 1, majority strata dominate) and uniform (temperature
    0), the standard α = 0.5 upsampling of minority sources/languages.

    Every arithmetic step is chosen to be ENGINE-EXACT so the sample is
    re-derivable by any SQL engine: weights use ``floor(sqrt(c))``
    (IEEE sqrt is correctly rounded, so its floor is exact), the
    allocation is 64-bit integer multiply-then-divide, and row selection
    is rank-by-deterministic-hash within each stratum (tiebreak on the
    key) — no RNG, no float thresholds. Two aggregates (stratum counts)
    + one window per stratum partition; the fact table shuffles once on
    the stratum key.
    """
    if total <= 0:
        raise ValueError(f"total must be positive, got {total}")
    hash_fn = _pick_hash(df, key_col, portable)
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_c"))
    weights = counts.select(
        stratum_col, F.floor(F.sqrt(F.col("_c"))).cast("long").alias("_w"))
    tot = weights.agg(F.sum("_w").alias("_sw"))
    # DIV, not floor(a/b): Spark's `/` on longs promotes to double, and
    # beyond 2^53 the 53-bit mantissa can put floor() off by one — DIV
    # stays in 64-bit integer math the whole way (truncation == floor
    # here since every operand is non-negative)
    targets = weights.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        (F.lit(int(total)).cast("long") * F.col("_w")).alias("_num"),
        F.col("_sw"),
    ).select(
        stratum_col,
        F.expr("_num DIV _sw").cast("long").alias("_target"),
    )
    w = Window.partitionBy(stratum_col).orderBy(
        hash_fn(F.col(key_col), salt), F.col(key_col))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(targets), stratum_col)
        .where(F.col("_rn") <= F.col("_target"))
        .drop("_rn", "_target")
    )


def epoch_oversample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    ratios: Mapping[str, float],
    portable: bool = False,
    salt: int = 0,
) -> DataFrame:
    """Epoch-style oversampling: stratum ``s`` is repeated
    ``ratios[s]`` times — whole copies plus a deterministic
    hash-ranked fraction, the standard way to upweight a small
    high-quality source in a training mix without RNG.

    Target row count per stratum is ``floor(c_s · ratio)`` exactly
    (ratio taken at 1e-6 integer precision so the arithmetic is
    engine-reproducible): every row gets ``floor(ratio)`` copies, and
    the top ``target − c_s·floor(ratio)`` rows by per-key hash rank get
    one more. Output carries ``copy_idx`` (0-based) so downstream
    shuffles can spread the copies. Strata absent from ``ratios`` pass
    through once. Plan: one count aggregate, a broadcast of per-stratum
    targets, one rank window per stratum, then a map-side
    ``explode(sequence)`` — copies never shuffle as inputs.
    """
    for s, r in ratios.items():
        if r < 0:
            raise ValueError(f"ratio for {s!r} must be >= 0, got {r}")
    hash_fn = _pick_hash(df, key_col, portable)
    # fixed-point ratio (1e-6) so target = floor(c * r) is integer math
    rmap = {s: int(round(r * 1_000_000)) for s, r in ratios.items()}
    ratio_col = F.coalesce(
        *[F.when(F.col(stratum_col) == F.lit(s), F.lit(r))
          for s, r in rmap.items()],
        F.lit(1_000_000),
    ) if rmap else F.lit(1_000_000)
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_c"))
    targets = counts.select(
        stratum_col,
        F.col("_c"),
        F.floor(F.col("_c") * ratio_col / 1_000_000).cast("long")
        .alias("_target"),
    )
    w = Window.partitionBy(stratum_col).orderBy(
        hash_fn(F.col(key_col), salt), F.col(key_col))
    ranked = df.withColumn("_rn", F.row_number().over(w))
    joined = ranked.join(F.broadcast(targets), stratum_col)
    # whole copies for everyone; ranks <= target % c get one extra
    whole = F.floor(F.col("_target") / F.col("_c")).cast("long")
    extra = (F.col("_rn") <= F.col("_target") % F.col("_c")).cast("long")
    n_copies = (whole + extra).alias("_k")
    return (
        joined.select("*", n_copies)
        .where(F.col("_k") > 0)
        .select(
            *[F.col(c) for c in df.columns],
            F.explode(
                F.sequence(F.lit(0), F.col("_k") - 1)).alias("copy_idx"),
        )
    )


def hash_split(
    df: DataFrame,
    key: str,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] | None = None,
    salt: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Deterministic train/val/test split by key hash — the assignment
    every training pipeline needs to be STABLE across reruns, engines,
    and data arrival order (``randomSplit`` gives none of those: it
    re-rolls per partition layout).

    Each key hashes once (:func:`knuth_hash`, portable integer math);
    the split is fixed cumulative thresholds over the 2³² hash space,
    computed in exact integer arithmetic (``floor(2³² · Σw)`` fences),
    so a key's split NEVER changes when other rows come or go — and
    all rows sharing a key (a user's events, a document's chunks) land
    in the same split, which is exactly the group-leakage guarantee
    k-fold assignment by row cannot give. Adds ``split`` (string).

    Map-only: no shuffle, no RNG, no state. At 100 TB this is a free
    scan predicate; at review time the oracle replays every fence.

    ``portable=True`` (the oracle-replayable Knuth hash) requires an
    integral key column and raises otherwise — a string key silently
    ``cast('long')``-ing to NULL would land every row in the last
    split; pass ``portable=False`` to split on xxhash64, which hashes
    any type (engine-stable, just not replayable in plain SQL).
    """
    if not weights or any(w <= 0 for w in weights):
        raise ValueError(f"weights must be positive, got {weights!r}")
    names = list(names) if names is not None else (
        ["train", "val", "test"] if len(weights) == 3
        else [f"split_{i}" for i in range(len(weights))])
    if len(names) != len(weights):
        raise ValueError(
            f"{len(weights)} weights but {len(names)} names")
    total = float(sum(weights))
    fences = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w
        fences.append(int(_MOD * (acc / total)))
    h = _pick_hash(df, key, portable)(key, salt=salt)
    expr = F.lit(names[-1])
    for fence, name in zip(reversed(fences), reversed(names[:-1])):
        expr = F.when(h < F.lit(fence), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def token_budget_mixture(
    df: DataFrame,
    budgets: dict[str, int],
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    default_budget: int = 0,
    portable: bool = True,
) -> DataFrame:
    """Select documents per source under a TOKEN budget — the unit
    training mixtures are actually denominated in (a 10-doc source of
    books outweighs a 1000-doc source of tweets by tokens, which is
    what the loss sees; row-count mixtures get this wrong).

    Docs are taken in deterministic :func:`knuth_hash` order within
    each source (an unbiased, rerun/engine-stable shuffle) while the
    running token total stays ≤ the source's budget; the doc that
    would cross the line is dropped (strict budgets — a 1M-token
    budget never yields 1.4M because a long doc straddled it).
    Sources absent from ``budgets`` get ``default_budget`` (0 ⇒
    excluded).

    One window pass per source key — no global sort, no driver state;
    budgets ship as a literal CASE (catalog-sized, not data-sized).

    ``portable=True`` (Knuth hash order, SQL-replayable) requires an
    integral ``id_col`` and raises otherwise — a string id silently
    hashing to NULL would degrade the "unbiased deterministic shuffle"
    to plain id order; ``portable=False`` orders by xxhash64 instead.
    """
    if any(b < 0 for b in budgets.values()) or default_budget < 0:
        raise ValueError("budgets must be non-negative")
    order_hash = _pick_hash(df, id_col, portable)
    budget_col = F.lit(int(default_budget))
    for src, b in sorted(budgets.items()):
        budget_col = F.when(
            F.col(source_col) == src, F.lit(int(b))).otherwise(budget_col)
    w = (
        Window.partitionBy(source_col)
        .orderBy(order_hash(F.col(id_col)), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("_cum", F.sum(tokens_col).over(w))
        .where(F.col("_cum") <= budget_col)
        .drop("_cum")
    )


def pack_concat_chunks(
    df: DataFrame,
    token_col: str,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    portable: bool = True,
) -> DataFrame:
    """Concat-then-chunk sequence packing report, one row per shard.

    The standard LLM-pretraining packing scheme: documents are laid out
    in a deterministic order, token streams concatenated, and the
    stream cut into fixed ``budget``-token windows; a document whose
    span crosses a cut boundary "straddles" (it will be split across
    two training sequences). This operator computes, WITHOUT
    materializing any token stream, the packing layout per shard:

    - shard = hash(id) % n_shards (portable Knuth hash by default, so
      an external SQL engine reproduces the exact same layout);
    - within a shard, docs are ordered by (hash, id) — a deterministic
      shuffle, the same low-discrepancy order the samplers use;
    - doc spans come from a running token sum: first_bin =
      cum_before DIV budget, last_bin = (cum_before + n - 1) DIV
      budget; straddle = last_bin > first_bin.

    Output per shard: docs, tokens, n_bins (= ceil(tokens/budget)),
    straddled docs + an id-sum checksum of WHICH docs straddle,
    tail_waste (pad tokens in the final bin) and fill_pct — all
    integers, fully oracle-replayable.

    Scale: the only state is one window cum-sum PARTITIONED BY shard —
    shards are independent, so parallelism = n_shards (set it to the
    cluster's task count; each shard's window is a single sorted run).
    No global sort, no collect; zero-token docs are excluded up front
    (they occupy no stream positions).
    """
    hash_fn = _pick_hash(df, id_col, portable)
    from pyspark.sql import Window

    b = int(budget)
    d = (df.where(F.col(token_col).isNotNull() & (F.col(token_col) > 0))
         .select(F.col(id_col).alias("_id"),
                 F.col(token_col).cast("long").alias("_n"),
                 hash_fn(id_col).alias("_h")))
    d = d.withColumn("_shard", F.pmod(F.col("_h"), F.lit(int(n_shards))))
    w = (Window.partitionBy("_shard").orderBy("_h", "_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("_cum", F.sum("_n").over(w))
    d = d.select(
        "_shard", "_id", "_n", "_cum",
        (F.col("_cum") - F.col("_n")).alias("_before"))
    d = d.select(
        "_shard", "_id", "_n", "_cum",
        F.expr(f"_before DIV {b}").alias("_fb"),
        F.expr(f"(_cum - 1) DIV {b}").alias("_lb"))
    return (
        d.groupBy("_shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("_n").alias("tokens"),
            F.sum(F.when(F.col("_lb") > F.col("_fb"), 1).otherwise(0))
            .alias("straddled"),
            F.sum(F.when(F.col("_lb") > F.col("_fb"), F.col("_id"))
                  .otherwise(0)).alias("straddle_id_sum"))
        .select(
            F.col("_shard").alias("shard"), "docs", "tokens",
            F.expr(f"(tokens + {b} - 1) DIV {b}").alias("n_bins"),
            "straddled", "straddle_id_sum",
            (F.expr(f"((tokens + {b} - 1) DIV {b}) * {b}")
             - F.col("tokens")).alias("tail_waste"),
            F.expr(f"(tokens * 100) DIV (((tokens + {b} - 1) DIV {b}) * {b})")
            .alias("fill_pct"))
        .orderBy("shard"))


def temperature_allocation(
    df: DataFrame,
    group_col: str,
    budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled mixture allocation: how many docs to draw
    from each source so group g gets share ∝ n_g^alpha (the
    multilingual/LLM corpus-balancing scheme — alpha=1 is proportional,
    alpha→0 uniform; mT5/UNIMAX-style upsampling of small sources).

    Exact integer allocation by LARGEST-REMAINDER (Hamilton) rounding:
    base_g = budget·w_g div W, then the budget − Σbase leftovers go to
    the largest remainders (ties → smallest group key). Output sums to
    ``budget`` exactly.

    Portability design: alpha is restricted to {0.25, 0.5, 0.75} —
    weights come from IEEE-754 ``sqrt`` (CORRECTLY ROUNDED by the
    standard, hence bit-identical in every engine), composed as
    sqrt(n), sqrt(sqrt(n)), sqrt(n)·sqrt(sqrt(n)); a general
    ``pow(n, alpha)`` is libm-dependent and NOT cross-engine stable.
    The weight is then fixed-pointed (floor(w·10^6)) so every
    downstream step — W, base, remainder, rank — is pure int64
    arithmetic an oracle replays byte-for-byte.

    Scale shape: one count aggregate over the data, then ALL work
    happens on the per-group relation (≤ thousands of rows); the rank
    window runs over groups, never data rows. budget·w_fixed must fit
    int64: budget ≤ ~10^5 with w_fixed ≤ 10^12 (n ≤ 10^12 rows/group)
    — beyond that, drop FIXED_SCALE a decade.
    """
    counts = (df.where(F.col(group_col).isNotNull())
              .groupBy(F.col(group_col).alias("grp"))
              .agg(F.count(F.lit(1)).alias("n_docs")))
    return allocate_by_temperature(counts, budget, alpha).orderBy("grp")


def allocate_by_temperature(
    counts: DataFrame,
    budget: int,
    alpha: float = 0.5,
    grp_col: str = "grp",
    n_col: str = "n_docs",
) -> DataFrame:
    """Hamilton-rounded temperature allocation over an already-
    aggregated ``(grp, n)`` relation — the machinery of
    :func:`temperature_allocation`, factored out so callers can
    allocate over any mass (doc counts there, TOKEN totals in
    :func:`corpus_build_plan`). Same portability contract: alpha ∈
    {0.25, 0.5, 0.75} via IEEE-correctly-rounded sqrt composition,
    fixed-point int64 arithmetic end to end, output sums to ``budget``
    exactly. All work runs on the per-group relation.
    """
    from pyspark.sql import Window

    FIXED = 1_000_000
    b = int(budget)
    if alpha == 0.5:
        w_expr = f"sqrt(cast({n_col} as double))"
    elif alpha == 0.25:
        w_expr = f"sqrt(sqrt(cast({n_col} as double)))"
    elif alpha == 0.75:
        w_expr = (f"sqrt(cast({n_col} as double)) "
                  f"* sqrt(sqrt(cast({n_col} as double)))")
    else:
        raise ValueError(
            f"alpha must be one of 0.25, 0.5, 0.75 (IEEE-sqrt-"
            f"composable, engine-portable); got {alpha}")

    weighted = counts.select(
        grp_col, n_col,
        F.expr(f"CAST(floor(({w_expr}) * {FIXED}) AS BIGINT)")
        .alias("w_fixed"))
    tot = weighted.agg(F.sum("w_fixed").alias("w_total"),
                       F.count(F.lit(1)).alias("n_groups"))
    j = weighted.crossJoin(F.broadcast(tot)).select(
        grp_col, n_col, "w_fixed",
        F.expr(f"({b} * w_fixed) DIV w_total").alias("base"),
        F.expr(f"({b} * w_fixed) % w_total").alias("rem"))
    leftover = F.lit(b) - F.sum("base").over(
        Window.partitionBy())  # over the group relation only
    ranked = j.withColumn(
        "_rk", F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col(grp_col))))
    return (ranked
            .withColumn("_left", leftover)
            .select(
                grp_col, n_col, "w_fixed",
                (F.col("base")
                 + F.when(F.col("_rk") <= F.col("_left"), 1)
                 .otherwise(0)).alias("alloc")))


def neyman_allocation(
    df: DataFrame,
    group_col: str,
    value_cents,
    budget: int,
) -> DataFrame:
    """Neyman (σ-proportional) stratified allocation — the
    survey-sampling optimum for estimating a mean under a fixed budget:
    stratum h gets share ∝ N_h·σ_h, so volatile strata are sampled
    harder than steady ones. Completes the allocation family next to
    proportional hash sampling and :func:`temperature_allocation`.

    Portability design: N_h·σ_h = sqrt(n·Σx² − (Σx)²) EXACTLY, so the
    weight is ONE IEEE sqrt of an exact integer — values enter as
    integer cents, moments accumulate in DECIMAL(38,0) (Σx² of 10⁸-cent
    values overflows int64), and the integer-ized weight
    floor(sqrt(D_h)) feeds the same largest-remainder (Hamilton)
    rounding as temperature_allocation (ties → smallest stratum key;
    output sums to ``budget`` exactly). Zero-variance strata weigh 0 —
    a constant stratum needs one probe, which the caller adds if the
    estimator requires it. All post-aggregate work runs on the
    per-stratum relation, never data rows.
    """
    from pyspark.sql import Window

    b = int(budget)
    x = value_cents.cast("decimal(19,0)")
    moments = (
        df.where(F.col(group_col).isNotNull())
        .groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum(x).alias("_sx"),
             F.sum(x * x).alias("_sxx")))
    d = (F.col("n_rows").cast("decimal(38,0)") * F.col("_sxx")
         - F.col("_sx") * F.col("_sx"))
    weighted = moments.select(
        "grp", "n_rows",
        F.floor(F.sqrt(d.cast("double"))).cast("long").alias("w_fixed"))
    tot = weighted.agg(F.sum("w_fixed").alias("w_total"))
    j = weighted.crossJoin(F.broadcast(tot)).select(
        "grp", "n_rows", "w_fixed",
        F.when(F.col("w_total") > 0,
               F.expr(f"({b} * w_fixed) DIV w_total"))
        .otherwise(F.lit(0)).alias("base"),
        F.when(F.col("w_total") > 0,
               F.expr(f"({b} * w_fixed) % w_total"))
        .otherwise(F.lit(0)).alias("rem"))
    leftover = F.lit(b) - F.sum("base").over(Window.partitionBy())
    ranked = j.withColumn(
        "_rk", F.row_number().over(
            Window.orderBy(F.col("rem").desc(), F.col("grp"))))
    return (ranked
            .withColumn("_left", leftover)
            .select(
                "grp", "n_rows", "w_fixed",
                (F.col("base")
                 + F.when(F.col("_rk") <= F.col("_left"), 1)
                 .otherwise(0)).alias("alloc"))
            .orderBy("grp"))


def class_balanced_sample(
    df: DataFrame,
    class_col: str,
    key_col: str,
) -> DataFrame:
    """Class-balanced undersampling: every class keeps exactly
    ``min(class sizes)`` rows — the standard rebalancing step before
    training on skewed labels. Selection is by KEY-HASH RANK inside
    each class (Knuth multiplicative hash — the engine-portable
    sampler every split/sample op here shares), so the kept set is
    deterministic, re-run-stable, and an oracle can replay the exact
    rows.

    One count aggregate (broadcast back — the class relation is tiny),
    one PARTITIONED rank window per class over (hash, key). Returns
    the kept rows with their rank.
    """
    from pyspark.sql import Window

    from bigdata_tag_system_spark.operators.sampling import knuth_hash

    counts = (df.where(F.col(class_col).isNotNull())
              .groupBy(F.col(class_col)).agg(
                  F.count(F.lit(1)).alias("_n")))
    m = counts.agg(F.min("_n").alias("_m"))
    h = knuth_hash(F.col(key_col), 11)
    w = Window.partitionBy(class_col).orderBy(h.asc(), F.col(key_col))
    return (
        df.where(F.col(class_col).isNotNull())
        .withColumn("_rk", F.row_number().over(w))
        .crossJoin(F.broadcast(m))
        .where(F.col("_rk") <= F.col("_m"))
        .drop("_m")
    )


def temporal_purged_split(
    df: DataFrame,
    ts_col: str,
    train_end: str,
    embargo: str = "0 days",
    split_col: str = "split",
) -> DataFrame:
    """Time-ordered train/test split with an EMBARGO gap — the purged
    split from the financial-ML literature (López de Prado, *Advances
    in Financial Machine Learning* ch. 7): rows before ``train_end``
    train, rows from ``train_end + embargo`` on test, and rows INSIDE
    the gap are dropped entirely. The gap is the leakage fence the
    plain temporal split lacks: with label horizons or serial
    correlation, observations just after the boundary share information
    with the last training labels, and a model scored on them reads
    better than it is.

    Map-only (one filter + one conditional projection — a free rider
    on any scan); deterministic for a given (train_end, embargo).
    Complements the hash/group splits in this module: use THIS one
    whenever the label is forward-looking in time.
    """
    cut = F.to_timestamp(F.lit(train_end))
    test_start = cut + F.expr(f"INTERVAL {embargo}")
    ts = F.col(ts_col)
    return (
        df.where((ts < cut) | (ts >= test_start))
        .withColumn(split_col,
                    F.when(ts < cut, "train").otherwise("test"))
    )



def rolling_origin_folds(
    df: DataFrame,
    ts_col: str,
    fold_ends: Sequence[str],
    horizon: str = "7 days",
) -> DataFrame:
    """Rolling-origin (expanding-window) backtest folds — the standard
    time-series evaluation protocol: for each fold cut, train on
    everything before it, test on the fixed ``horizon`` after it. A row
    belongs to SEVERAL folds (fold 2's train contains fold 1's test),
    which one split column cannot express, so each row explodes into
    its (fold, split) memberships; the explode factor is ``|folds|`` —
    a literal plan constant, never data-driven. Completes the split
    family: hash (IID), group-coherent (leak-free entities), purged
    temporal (single fence + embargo), rolling-origin (evaluation over
    time).

    Returns the input columns + (fold_id, split).
    """
    if not fold_ends:
        raise ValueError("fold_ends must be non-empty")
    ts = F.col(ts_col)
    memberships = F.array(*[
        F.struct(
            F.lit(i).alias("fold_id"),
            F.when(ts < F.to_timestamp(F.lit(cut)), "train")
            .when(ts < F.to_timestamp(F.lit(cut))
                  + F.expr(f"INTERVAL {horizon}"), "test")
            .alias("split"))
        for i, cut in enumerate(fold_ends)
    ])
    return (
        df.select("*", F.explode(memberships).alias("_m"))
        .where(F.col("_m.split").isNotNull())
        .select("*", F.col("_m.fold_id").alias("fold_id"),
                F.col("_m.split").alias("split"))
        .drop("_m")
    )


def coverage_select(
    docs: DataFrame,
    k: int = 4,
    pool: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Greedy submodular max-coverage selection: pick ``k`` documents
    maximizing the number of DISTINCT shingles covered — the
    facility-location/coverage selector of LLM data curation (greedy
    is (1−1/e)-optimal for monotone submodular objectives,
    Nemhauser '78). Complements MMR: MMR penalizes redundancy against
    a query, coverage maximizes corpus-footprint with no query at all.

    The candidate pool is the top-``pool`` docs by distinct-shingle
    count (integer TakeOrdered, id ties) — corpus-scale work ends
    there; the greedy loop collects the pool's shingle sets (bounded:
    pool × shingles/doc) and runs driver-side. Every quantity is an
    INTEGER (gains, coverage totals), so the result is hash-exact in
    any engine with no quantization story needed.
    """
    from bigdata_tag_system_spark.functions.text import word_shingles

    sh = docs.select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), shingle_n).alias("_sh"))
    sized = sh.select(
        "_id", "_sh", F.size("_sh").alias("_n")).where(F.col("_n") > 0)
    rows = (sized.orderBy(F.desc("_n"), F.col("_id"))
            .limit(int(pool)).collect())
    cand = [(r["_id"], set(r["_sh"])) for r in rows]

    covered: set[str] = set()
    picks: list[tuple[object, int, int]] = []  # (id, gain, total)
    remaining = list(cand)
    for _ in range(min(int(k), len(cand))):
        best = None
        for cid, s in remaining:
            gain = len(s - covered)
            key = (-gain, cid)
            if best is None or key < best[0]:
                best = (key, cid, s, gain)
        _, cid, s, gain = best
        covered |= s
        picks.append((cid, gain, len(covered)))
        remaining = [c for c in remaining if c[0] != cid]

    spark = docs.sparkSession
    # ids ship back as literals of the column's NATIVE type — id_col is
    # a generic parameter, so no int() coercion (string ids work); the
    # cast pins F.lit's inferred type back to the source schema.
    id_type = docs.schema[id_col].dataType
    out = [
        F.struct(F.lit(i + 1).alias("rank"),
                 F.lit(cid).cast(id_type).alias(id_col),
                 F.lit(int(g)).alias("gain"),
                 F.lit(int(tot)).alias("covered_total"))
        for i, (cid, g, tot) in enumerate(picks)
    ]
    return (spark.range(1)
            .select(F.explode(F.array(*out)).alias("s"))
            .select("s.rank", f"s.{id_col}", "s.gain",
                    "s.covered_total")
            .orderBy("rank"))


def corpus_build_plan(
    docs: DataFrame,
    benchmark: DataFrame,
    token_budget: int,
    alpha: float = 0.5,
    contamination_ngram: int = 3,
    min_overlap: int = 2,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """END-TO-END pretraining corpus build: the recipe a training-data
    job actually runs, composed from the engine's certified primitives
    into ONE auditable plan — scrub → decontaminate → allocate →
    select → account. The pieces are individually oracle-certified;
    the composition is where real pipelines break (an allocation over
    pre-dedup counts, a selection that ignores the decontamination
    drop, a budget that silently over/under-fills), so the output is
    the per-source ACCOUNTING LEDGER with every stage's arithmetic
    replayable end to end.

    Stages (all deterministic, all integer or IEEE-sqrt arithmetic):

    1. **Scrub** — exact dedup (min-id winner per normalized-text
       digest, :func:`~.dedup.exact_dedup`); cross-source dup losers
       are charged to THEIR source's ledger row.
    2. **Decontaminate** — drop docs sharing ≥ ``min_overlap``
       distinct ``contamination_ngram``-grams with any benchmark doc
       (:func:`~.text.ngram_contamination`, benchmark broadcast).
    3. **Allocate** — per-source TOKEN budgets ∝ tokens^alpha
       (:func:`allocate_by_temperature` over the post-exclusion token
       mass — allocating over raw pre-dedup counts is the classic
       over-weighting bug; Hamilton rounding, Σ = ``token_budget``
       exactly).
    4. **Select** — docs in deterministic :func:`knuth_hash` order per
       source while the running token total stays ≤ the source's
       allocation (strict budgets, :func:`token_budget_mixture`
       semantics with the budget joined from stage 3 instead of a
       literal).
    5. **Account** — one row per source: raw/removed/available doc
       counts, available tokens, allocated tokens, picked docs/tokens,
       fill basis points, and an id-sum checksum pinning WHICH docs
       were picked.

    Scale shape: one digest shuffle (scrub), one gram join with the
    benchmark broadcast (decontaminate), per-source aggregates (small
    relation) for the allocation, and ONE per-source window cum-sum
    for the selection — the token_budget_mixture caveat applies: a
    source's rows form one sorted run, so at extreme per-source
    cardinality switch the selection to the two-level bucketed cumsum.
    Requires an integral ``id_col`` (portable hash order).
    """
    from .text import ngram_contamination
    from bigdata_tag_system_spark.functions.sqlrender import (
        fresh_ids,
        ident,
    )

    if token_budget <= 0:
        raise ValueError(
            f"token_budget must be positive, got {token_budget}")
    # enforce (not just document) the integral-id contract: the knuth
    # selection order casts to long, and a string id would silently
    # hash to NULL — one arbitrary-order branch instead of the
    # deterministic shuffle the ledger's checksum certifies
    _pick_hash(docs, id_col, portable=True)
    # ANNOTATED-FLAGS shape: one per-doc relation carries every stage's
    # verdict (dup loser? contaminated? picked?), so the final ledger
    # is ONE conditional aggregate — the naive formulation (join five
    # aggregates of five increasingly-filtered relations) re-derives
    # the scrub+decontaminate subplan once per ledger column branch,
    # which at corpus scale re-tokenizes the corpus ~4× for nothing.
    #
    # Each checkpoint segment is rendered as ONE parsed SQL statement
    # (r14, guide §5): the Column-API build paid ~3,400 py4j
    # round-trips (~1.4 s driver-blocked). The SQL transcribes the
    # former expressions verbatim — token_count's empty-guard CASE,
    # _row_digest's null-text coalesce, the knuth multiplicative hash
    # (pre-reduction mod 2³¹ included), every flag and fence — so the
    # analyzed plan and the whole ledger are unchanged; repeated
    # relation references go through fresh_ids (sqlrender rules).
    spark = docs.sparkSession
    i, s, t = ident(id_col), ident(source_col), ident(text_col)
    norm = f"trim(regexp_replace(lower({t}), '\\\\s+', ' '))"
    base = spark.sql(
        f"""
        SELECT {i}, {s} AS source, {t},
               CAST(CASE WHEN {norm} = '' THEN 0
                         ELSE size(split({norm}, ' ')) END AS BIGINT)
               AS _ntok,
               coalesce(md5({norm}),
                        concat('null-text:', CAST({i} AS STRING)))
               AS _dg
        FROM {{docs}}
        WHERE {t} IS NOT NULL AND {s} IS NOT NULL
        """,
        docs=docs,
        # base feeds the digest-winner aggregate AND the annotate join
        # — lazy-checkpoint so the tokenize+digest projection runs once
    ).localCheckpoint(eager=False)
    ann = spark.sql(
        f"""
        WITH winners AS (SELECT _dg, min({i}) AS _wid
                         FROM {{b1}} GROUP BY _dg)
        SELECT {i}, source, {t}, _ntok,
               CAST({i} = _wid AS INT) AS _survivor
        FROM {{b2}} JOIN winners USING (_dg)
        """,
        b1=fresh_ids(base), b2=base,
        # ann feeds the contamination screen AND the clean-flag join —
        # checkpoint before forking (still carries text; dropped below)
    ).localCheckpoint(eager=False)
    # contamination runs over SURVIVORS only (a dup loser's grams are
    # its winner's grams — screening it twice would double-charge)
    cont_ids = ngram_contamination(
        ann.where("_survivor = 1").select(id_col, text_col),
        benchmark, n=contamination_ngram,
        text_col=text_col, id_col=id_col, min_overlap=min_overlap
    ).select(F.col(id_col), F.lit(1).alias("_cont"))
    ann = spark.sql(
        f"""
        SELECT /*+ BROADCAST(c) */
               a.{i}, a.source, a._ntok, a._survivor, c._cont,
               CAST(a._survivor = 1 AND c._cont IS NULL AS INT) AS _clean
        FROM {{ann}} a LEFT JOIN {{c}} c ON a.{i} = c.{i}
        """,
        ann=ann, c=cont_ids,
        # the annotated (narrow, text-free) relation feeds the
        # allocator aggregate AND the selection window — checkpoint so
        # the scrub+decontaminate chain is computed once end to end
    ).localCheckpoint(eager=False)

    # sources with ZERO clean docs stay out of the allocator (they
    # have no selectable mass; a Hamilton leftover seat parked on one
    # would be unfillable) — they re-enter the ledger with alloc 0
    avail = spark.sql(
        """
        SELECT source, sum(_clean) AS _docs_clean,
               sum(_ntok * _clean) AS tokens_avail
        FROM {ann} GROUP BY source HAVING sum(_clean) > 0
        """,
        ann=ann)
    alloc = allocate_by_temperature(
        avail.select("source", F.col("tokens_avail").alias("n_docs")),
        token_budget, alpha, grp_col="source").select(
            "source", F.col("alloc").alias("alloc_tokens"))

    # flagged running sum ≡ the cumsum over the filtered clean relation
    # (dirty rows contribute 0), so selection needs no second filtered
    # window input — one shuffle on source covers annotate + select
    return spark.sql(
        f"""
        WITH j AS (
          SELECT /*+ BROADCAST(al) */
                 a.{i}, a.source, a._ntok, a._survivor, a._clean,
                 coalesce(al.alloc_tokens, 0) AS alloc_tokens
          FROM {{ann}} a LEFT JOIN {{al}} al ON a.source = al.source),
        sel AS (
          SELECT *,
                 CAST(_clean = 1 AND _cum <= alloc_tokens AS INT)
                 AS _picked
          FROM (SELECT *,
                       sum(_ntok * _clean) OVER (
                         PARTITION BY source
                         ORDER BY pmod(pmod(CAST({i} AS BIGINT) + 0,
                                            2147483648) * 2654435761,
                                       4294967296), {i}
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) AS _cum
                FROM j))
        SELECT source, count(1) AS n_raw,
               sum(1 - _survivor) AS n_exact_dups,
               sum(_survivor - _clean) AS n_contaminated,
               sum(_clean) AS docs_avail,
               sum(_ntok * _clean) AS tokens_avail,
               first(alloc_tokens) AS alloc_tokens,
               sum(_picked) AS picked_docs,
               sum(_ntok * _picked) AS picked_tokens,
               CAST(CASE WHEN first(alloc_tokens) > 0
                         THEN sum(_ntok * _picked) * 10000
                              DIV first(alloc_tokens)
                         ELSE 0 END AS BIGINT) AS fill_bp,
               sum({i} * _picked) AS picked_id_sum
        FROM sel GROUP BY source ORDER BY source
        """,
        ann=fresh_ids(ann), al=alloc,
    )
