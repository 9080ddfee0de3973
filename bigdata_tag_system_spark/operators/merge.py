"""Profile merge strategies: new tag profiles × previously-stored profiles.

Reference semantics (SURVEY §2.5 D4, §3 step 9):

- MEMORY_ONLY — new profiles overwrite (``advanced_tag_merger.py:153-160``).
- MEMORY_THEN_DATABASE — array-union new tags with the stored set per user
  (``src/merger/advanced_tag_merger.py:52-67``).
- Spec's batch merge — FULL OUTER join + key coalesce
  (`docs/标准需求文档.md` §4.3 ``merge_batch_user_tags``).

The reference's two merge paths disagree on ordering (UDF sorts,
``tag_merger.py:213``; native path doesn't, ``mysql_writer.py:178``). Here
there is one canonical form: ``array_sort(array_distinct(array_union(...)))``
— native expressions, no Python UDF, deterministic.

Scale note: this is the one unavoidable shuffle in the pipeline (join on
user_id). Both sides are pre-projected to (user_id, tag_ids[, details]) so
the shuffle moves only key + small arrays, and AQE handles skew.
"""

from __future__ import annotations

from enum import Enum
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MergeStrategy(str, Enum):
    OVERWRITE = "overwrite"          # MEMORY_ONLY: new wins wholesale
    UNION = "union"                  # MEMORY_THEN_DATABASE: set-union per user
    FULL_OUTER_UNION = "full_outer"  # spec §4.3: keep users present on either side


def _sorted_union(a, b):
    return F.array_sort(
        F.array_distinct(
            F.array_union(
                F.coalesce(a, F.array().cast("array<int>")),
                F.coalesce(b, F.array().cast("array<int>")),
            )
        )
    )


def merge_profiles(
    new: DataFrame,
    existing: DataFrame | None,
    strategy: MergeStrategy | str = MergeStrategy.UNION,
    user_col: str = "user_id",
) -> DataFrame:
    """Merge new profile rows with previously stored ones.

    ``new`` and ``existing`` both carry ``(user_col, tag_ids array<int>,
    [tag_details map], computed_date)``; ``existing`` may be None/empty.
    """
    strategy = MergeStrategy(strategy)
    if existing is None or strategy == MergeStrategy.OVERWRITE:
        return new

    has_details = "tag_details" in new.columns and "tag_details" in existing.columns
    old_cols = [F.col(user_col), F.col("tag_ids").alias("_old_tag_ids")]
    if has_details:
        old_cols.append(F.col("tag_details").alias("_old_tag_details"))
    # non-tag attributes (computed_date, …) the store also carries: in the
    # full-outer branch a user present only in `existing` must keep them,
    # so project them in as _old_* for the coalesce below
    extra_cols = [
        c for c in new.columns
        if c not in (user_col, "tag_ids", "tag_details") and c in existing.columns
    ]
    if strategy == MergeStrategy.FULL_OUTER_UNION:
        old_cols.extend(F.col(c).alias(f"_old_{c}") for c in extra_cols)
    old = existing.select(*old_cols)

    if strategy == MergeStrategy.UNION:
        # Users only in `existing` keep their stored row untouched (the
        # reference merges only users present in the new batch,
        # advanced_tag_merger.py:52-67) → left join from new.
        joined = new.join(old, on=user_col, how="left")
    else:  # FULL_OUTER_UNION
        joined = new.join(old, on=user_col, how="full_outer")

    out_cols = [F.col(user_col)]
    out_cols.append(_sorted_union(F.col("tag_ids"), F.col("_old_tag_ids")).alias("tag_ids"))
    for c in new.columns:
        if c in (user_col, "tag_ids"):
            continue
        if c == "tag_details" and has_details:
            # stored details survive for tags the new batch didn't re-hit,
            # new details win per key — keeps tag_details consistent with
            # the unioned tag_ids
            new_d, old_d = F.col("tag_details"), F.col("_old_tag_details")
            combined = F.map_concat(
                F.map_filter(old_d, lambda k, _: ~F.map_contains_key(new_d, k)),
                new_d,
            )
            merged_d = (
                F.when(old_d.isNull(), new_d)
                .when(new_d.isNull(), old_d)
                .otherwise(combined)
            )
            out_cols.append(merged_d.alias("tag_details"))
        elif strategy == MergeStrategy.FULL_OUTER_UNION and c in extra_cols:
            # new wins when present; stored-only users keep their stored value
            out_cols.append(F.coalesce(F.col(c), F.col(f"_old_{c}")).alias(c))
        else:
            out_cols.append(F.col(c))
    return joined.select(*out_cols)


def merge_additive_aggregates(
    store: DataFrame,
    delta: DataFrame,
    key_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str | None = None,
    max_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
) -> DataFrame:
    """Incremental aggregate-view maintenance: merge a DELTA of partial
    aggregates into a per-key aggregate STORE so the result equals the
    aggregate over (old facts ∪ new facts) WITHOUT rescanning old facts
    — the pattern that keeps a 100 TB rollup daily-updatable at the
    cost of the day's slice. Only works for DECOMPOSABLE aggregates,
    which is exactly what the column roles encode: counts and sums add,
    maxes take the greater, mins the lesser (averages ride as
    sum+count; distincts need the mergeable sketches in
    ``operators/sketches.py`` — this function is their exact-arithmetic
    complement).

    Contrast with :func:`~bigdata_tag_system_spark.sources.writers.merge_upsert_frames`:
    upsert REPLACES a matched key's value (last writer wins); this
    COMBINES both sides' values. One full-outer join on the key, all
    combination map-side.
    """
    keys = list(key_cols)
    roles: list[tuple[str, str]] = (
        [(c, "sum") for c in sum_cols]
        + ([(count_col, "sum")] if count_col else [])
        + [(c, "max") for c in max_cols]
        + [(c, "min") for c in min_cols])
    if not roles:
        raise ValueError("at least one aggregate column is required")
    seen = [c for c, _ in roles]
    if len(seen) != len(set(seen)):
        raise ValueError(f"aggregate column listed twice: {seen}")
    d = delta.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"_d_{c}") for c, _ in roles])
    joined = store.join(d, keys, "full_outer")
    combine = {
        "sum": lambda c: (F.coalesce(F.col(c), F.lit(0))
                          + F.coalesce(F.col(f"_d_{c}"), F.lit(0))),
        "max": lambda c: F.greatest(F.col(c), F.col(f"_d_{c}")),
        "min": lambda c: F.least(F.col(c), F.col(f"_d_{c}")),
    }
    # greatest/least ignore NULLs (two-arg form returns the non-null
    # side), which is exactly the unmatched-side semantics needed.
    # Output columns follow the STORE's order, so the merged relation
    # is drop-in writable back over the store
    by_name = dict(roles)
    out_cols = []
    for c in store.columns:
        if c in keys:
            out_cols.append(F.col(c))
        elif c in by_name:
            out_cols.append(combine[by_name[c]](c).alias(c))
    return joined.select(*out_cols)
