"""Static plan linting: catch 100 TB scale hazards before they run.

A query that is correct at sf0.01 can still be a cluster-killer: a
cartesian product, a row-at-a-time Python UDF in the hot path, or a
window over an empty PARTITION BY (every row through ONE task) all pass
small tests and then melt at scale. These checks read the PHYSICAL plan
(what will actually execute, after Catalyst), so they see through
DataFrame-API surface differences.

Usage::

    from bigdata_tag_system_spark.plans.lint import assert_scalable
    assert_scalable(df)                     # raises on any hazard
    warnings = plan_warnings(df)            # or inspect manually

``assert_scalable`` is test-friendly: the engine's own suites call it on
operator plans, turning "no anti-pattern" from a review habit into an
executable invariant. Known-bounded exceptions (e.g. a rank window over
an already-limited top-k relation) are opted out per call, loudly.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# hazard key -> (plan marker regex, human explanation)
_CHECKS: dict[str, tuple[str, str]] = {
    "cartesian": (
        r"CartesianProduct",
        "cartesian product: pair count is |left|x|right|; add a join key, "
        "broadcast the small side, or bucketize (range/interval join)",
    ),
    "python_row_udf": (
        r"BatchEvalPython",
        "row-at-a-time Python UDF: serializes every row through pickle; "
        "use built-in expressions or an Arrow-vectorized pandas_udf",
    ),
    # the spec prints partition columns BEFORE sort orders; if the FIRST
    # argument already carries ASC/DESC there are no partition columns
    # (heuristic: misses expression-valued sort keys, catches the common
    # bare-column case)
    "global_window": (
        r"windowspecdefinition\([^,()]* (?:ASC|DESC)",
        "window with empty PARTITION BY: every row flows through a single "
        "task; partition the window or use orderBy+limit for top-k",
    ),
    "rdd_scan": (
        r"Scan ExistingRDD|Scan\[obj#",
        "RDD-backed scan: no column pruning or predicate pushdown; load "
        "through a DataFrame reader",
    ),
}


def plan_warnings(df: DataFrame, checks: list[str] | None = None) -> list[str]:
    """Hazards found in ``df``'s executed plan (empty list = clean)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for key, (pattern, why) in _CHECKS.items():
        if checks is not None and key not in checks:
            continue
        if re.search(pattern, plan):
            out.append(f"{key}: {why}")
    return out


def assert_scalable(df: DataFrame, allow: list[str] | None = None) -> None:
    """Raise ``ValueError`` when the plan contains a scale hazard.

    ``allow`` lists hazard keys that are acceptable for THIS plan (e.g.
    ``["global_window"]`` when the window input is bounded by an earlier
    limit) — an explicit, reviewable opt-out rather than a silent skip.
    """
    allowed = set(allow or ())
    unknown = allowed - _CHECKS.keys()
    if unknown:
        raise ValueError(f"unknown hazard keys in allow: {sorted(unknown)}")
    findings = [
        w for w in plan_warnings(df) if w.split(":", 1)[0] not in allowed
    ]
    if findings:
        raise ValueError(
            "plan has scale hazards:\n  " + "\n  ".join(findings))
