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
    # a BroadcastNestedLoopJoin is the OTHER way a cross join ships: the
    # build side is broadcast whole and every (left, right) pair is
    # scored — |left|x|right| work AND a data-sized broadcast when the
    # build side is a real relation. The engine's dominant LEGITIMATE
    # use is crossJoining a one-row scalar aggregate (corpus totals,
    # fence vectors), so this check is STRUCTURE-AWARE rather than a
    # bare regex: it walks the physical tree and flags only BNL joins
    # whose broadcast build side is NOT provably bounded (keyless
    # aggregate → ≤1 row, limit/top-k, or a driver-embedded literal
    # table). Data-sized builds — the brute-force pair modes — must
    # carry an explicit allowance.
    "bnl_join": (
        r"BroadcastNestedLoopJoin",
        "broadcast nested-loop join with a data-sized build side: "
        "|left|x|right| pair evaluations plus a full broadcast of the "
        "build relation; key the join (hash/bucket route) or bound the "
        "build side to a scalar/top-k relation",
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


# nodes that preserve (or reduce) their single child's row bound — safe
# to look through when deciding whether a broadcast build side is bounded
_ROW_BOUND_PRESERVING = {
    "WholeStageCodegenExec", "InputAdapter", "ProjectExec", "FilterExec",
    "SortExec", "CoalesceExec", "ColumnarToRowExec", "RowToColumnarExec",
    "ShuffleExchangeExec", "AQEShuffleReadExec",
    "BroadcastExchangeExec", "SubqueryBroadcastExec",
}
# nodes that BOUND their output regardless of input size
_ROW_BOUNDING = {
    "GlobalLimitExec", "LocalLimitExec", "CollectLimitExec",
    "TakeOrderedAndProjectExec", "LocalTableScanExec", "EmptyRelationExec",
}
_AGG_NODES = {
    "HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec",
}


def _node_name(node) -> str:
    return node.getClass().getSimpleName()


def _build_is_bounded(node) -> bool:
    """True when the broadcast build subtree provably produces a bounded
    (scalar / top-k / literal) relation no matter how big the data is."""
    name = _node_name(node)
    if name.endswith("QueryStageExec"):
        return _build_is_bounded(node.plan())
    if name == "ReusedExchangeExec":
        return _build_is_bounded(node.child())
    if name in _ROW_BOUNDING:
        return True
    if name == "RangeExec":
        # a Range is statically sized — literal in the plan
        return int(str(node.numElements())) <= 4096
    if name in _AGG_NODES:
        # grouping by nothing -> at most one row, full stop
        if node.groupingExpressions().isEmpty():
            return True
        # keyed aggregate: bounded only if its input already is
        # (e.g. an agg over a limited top-k) — fall through to child
    if name in _ROW_BOUND_PRESERVING or name in _AGG_NODES:
        ch = node.children()
        return ch.size() == 1 and _build_is_bounded(ch.apply(0))
    return False


def _unbounded_bnl_joins(node, out: list) -> None:
    name = _node_name(node)
    if name == "AdaptiveSparkPlanExec":
        _unbounded_bnl_joins(node.initialPlan(), out)
        return
    if name.endswith("QueryStageExec"):
        _unbounded_bnl_joins(node.plan(), out)
        return
    if name == "ReusedExchangeExec":
        return  # the reused exchange's own subtree is walked where built
    if name == "BroadcastNestedLoopJoinExec":
        ch = node.children()
        build = ch.apply(0 if "BuildLeft" in node.buildSide().toString()
                         else 1)
        if not _build_is_bounded(build):
            out.append(node)
    ch = node.children()
    for i in range(ch.size()):
        _unbounded_bnl_joins(ch.apply(i), out)


def _has_unbounded_bnl(df: DataFrame, plan_str: str) -> bool:
    try:
        offenders: list = []
        _unbounded_bnl_joins(
            df._jdf.queryExecution().executedPlan(), offenders)
        return bool(offenders)
    except Exception:
        # JVM API drift: degrade to the conservative regex (any BNL
        # flags) rather than silently passing cluster-killers
        return bool(re.search(r"BroadcastNestedLoopJoin", plan_str))


def plan_warnings(df: DataFrame, checks: list[str] | None = None) -> list[str]:
    """Hazards found in ``df``'s executed plan (empty list = clean)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = []
    for key, (pattern, why) in _CHECKS.items():
        if checks is not None and key not in checks:
            continue
        if key == "bnl_join":
            if _has_unbounded_bnl(df, plan):
                out.append(f"{key}: {why}")
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
