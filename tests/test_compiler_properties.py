"""Property-based parity: compiled Catalyst predicates vs an independent
three-valued-logic evaluator.

Hypothesis generates random condition trees (every operator family,
nested AND/OR/NOT groups, null-heavy data); each batch of trees compiles
to boolean projection columns evaluated in ONE Spark action and compared
cell-by-cell (True/False/NULL) against a pure-Python SQL-3VL evaluator.
This pins the compiler's documented null semantics (compiler.py module
docstring) against an implementation-independent model.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from bigdata_tag_system_spark.rules.compiler import compile_rule

# ---------------------------------------------------------------------------
# fixed row universe (null-heavy on purpose)
# ---------------------------------------------------------------------------

ROWS = [
    {"a": a, "s": s, "arr": arr}
    for a in (None, -2, 0, 3, 5)
    for s in (None, "", "ab", "ba", "b")
    for arr in (None, [], [1], [1, 2], [2, 3])
]

SCHEMA = "a int, s string, arr array<int>"

IN_VALUES = ["", "ab", "b", "zz"]
ARR_VALUES = [1, 2, 9]


# ---------------------------------------------------------------------------
# tree strategy
# ---------------------------------------------------------------------------

def _leaf() -> st.SearchStrategy:
    ints = st.integers(min_value=-3, max_value=6)
    num_cmp = st.builds(
        lambda op, v: {"field": "a", "operator": op, "value": v, "type": "number"},
        st.sampled_from(["=", "!=", ">", "<", ">=", "<="]), ints)
    num_range = st.builds(
        lambda lo, hi, neg: {"field": "a", "operator": "not_in_range" if neg else "in_range",
                             "value": [min(lo, hi), max(lo, hi)], "type": "number"},
        ints, ints, st.booleans())
    str_in = st.builds(
        lambda vals, neg: {"field": "s", "operator": "not_in" if neg else "in",
                           "value": vals, "type": "string"},
        st.lists(st.sampled_from(IN_VALUES), min_size=1, max_size=3), st.booleans())
    str_match = st.builds(
        lambda op, v: {"field": "s", "operator": op, "value": v, "type": "string"},
        st.sampled_from(["contains", "not_contains", "starts_with", "ends_with"]),
        st.sampled_from(["a", "b", "ab", ""]))
    nulls = st.builds(
        lambda f, op: {"field": f, "operator": op},
        st.sampled_from(["a", "s", "arr"]), st.sampled_from(["is_null", "is_not_null"]))
    arr_ops = st.builds(
        lambda op, vals: {"field": "arr", "operator": op, "value": vals, "type": "number"},
        st.sampled_from(["contains_any", "contains_all", "disjoint", "intersects"]),
        st.lists(st.sampled_from(ARR_VALUES), min_size=1, max_size=2))
    arr_contains = st.builds(
        lambda v: {"field": "arr", "operator": "array_contains", "value": v, "type": "number"},
        st.sampled_from(ARR_VALUES))
    return st.one_of(num_cmp, num_range, str_in, str_match, nulls, arr_ops, arr_contains)


def _tree(max_depth: int = 3) -> st.SearchStrategy:
    return st.recursive(
        _leaf(),
        lambda children: st.builds(
            lambda logic, conds: {"logic": logic, "conditions": conds},
            st.sampled_from(["AND", "OR", "NOT"]),
            st.lists(children, min_size=1, max_size=3)),
        max_leaves=6)


# ---------------------------------------------------------------------------
# independent 3VL evaluator (True / False / None)
# ---------------------------------------------------------------------------

def _not3(x):
    return None if x is None else not x


def _and3(xs):
    if any(x is False for x in xs):
        return False
    if any(x is None for x in xs):
        return None
    return True


def _or3(xs):
    if any(x is True for x in xs):
        return True
    if any(x is None for x in xs):
        return None
    return False


def _eval_leaf(node, row):
    f, op, v = node["field"], node["operator"], node.get("value")
    x = row[f]
    if op == "is_null":
        return x is None
    if op == "is_not_null":
        return x is not None
    if x is None:
        return None
    if op == "=":
        return x == v
    if op == "!=":
        return x != v
    if op == ">":
        return x > v
    if op == "<":
        return x < v
    if op == ">=":
        return x >= v
    if op == "<=":
        return x <= v
    if op == "in_range":
        return v[0] <= x <= v[1]
    if op == "not_in_range":
        return not v[0] <= x <= v[1]
    if op == "in":
        return x in v
    if op == "not_in":
        return x not in v
    if op == "contains":
        return str(v) in x
    if op == "not_contains":
        return str(v) not in x
    if op == "starts_with":
        return x.startswith(str(v))
    if op == "ends_with":
        return x.endswith(str(v))
    if op == "array_contains":
        return v in x
    if op in ("contains_any", "intersects"):
        return bool(set(v) & set(x))
    if op == "contains_all":
        return set(v) <= set(x)
    if op == "disjoint":
        return not set(v) & set(x)
    raise AssertionError(op)


def _eval(node, row):
    if "logic" in node or "conditions" in node:
        logic = node.get("logic", "AND").upper()
        vals = [_eval(c, row) for c in node.get("conditions", [])]
        if not vals:
            return True
        if logic == "AND":
            return _and3(vals)
        if logic == "OR":
            return _or3(vals)
        return _not3(_and3(vals))
    return _eval_leaf(node, row)


# ---------------------------------------------------------------------------
# the property
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def universe(spark):
    return spark.createDataFrame(ROWS, schema=SCHEMA).coalesce(1).cache()


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(trees=st.lists(_tree(), min_size=10, max_size=25))
def test_compiled_predicates_match_3vl_model(universe, trees):
    import pyspark.sql.functions as F

    cols = [compile_rule(t).alias(f"t{i}") for i, t in enumerate(trees)]
    got = universe.select(*cols).collect()
    for ridx, row in enumerate(ROWS):
        for tidx, tree in enumerate(trees):
            want = _eval(tree, row)
            have = got[ridx][f"t{tidx}"]
            assert have == want, (
                f"tree {tree!r} on row {row!r}: spark={have!r} model={want!r}")
