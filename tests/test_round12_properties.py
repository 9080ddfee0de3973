"""Property-based validation of the round-12 operators against
brute-force pure-Python models.

- remove_duplicated_spans must equal a from-scratch model on ANY small
  corpus: mark every token position covered by an n-gram appearing in
  >= min_docs distinct docs, subtract, rebuild in order.
- grouped_weighted_geomean must equal the log-domain Python reduction
  on ANY grouped positive values.
- normalize_per_user_arrow must equal the sample-stddev z-score model
  (degenerate groups -> 0.0) on ANY grouping.
"""

from __future__ import annotations

import math
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# tiny vocabulary so cross-doc duplicate n-grams actually occur
_WORDS = st.sampled_from(["aa", "bb", "cc", "dd"])
_DOC = st.lists(_WORDS, min_size=0, max_size=12).map(" ".join)


def _model_remove_spans(texts: dict[int, str], n: int, min_docs: int):
    # normalize_text collapses whitespace + lowercases; split("", " ")
    # yields [""] in Spark — mirror both exactly
    toks = {d: " ".join(t.split()).lower().split(" ")
            for d, t in texts.items()}
    grams: dict[tuple, set] = defaultdict(set)
    for d, tk in toks.items():
        for i in range(len(tk) - n + 1):
            grams[tuple(tk[i:i + n])].add(d)
    out = {}
    for d, tk in toks.items():
        covered = [False] * len(tk)
        for i in range(len(tk) - n + 1):
            if len(grams[tuple(tk[i:i + n])]) >= min_docs:
                for p in range(i, i + n):
                    covered[p] = True
        kept = [w for w, c in zip(tk, covered) if not c]
        out[d] = (len(tk), sum(covered), " ".join(kept))
    return out


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_DOC, min_size=2, max_size=6), st.integers(2, 4))
def test_remove_spans_matches_brute_model(spark, docs, n):
    from bigdata_tag_system_spark.operators.text import (
        remove_duplicated_spans,
    )

    texts = {i: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["removed_tokens"],
                         r["cleaned_text"])
           for r in remove_duplicated_spans(df, n=n, min_docs=2).collect()}
    want = _model_remove_spans(texts, n, 2)
    assert got == want


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(0, 2),
              st.floats(0.5, 100.0, allow_nan=False),
              st.floats(0.1, 10.0, allow_nan=False)),
    min_size=1, max_size=30))
def test_udaf_geomean_matches_log_domain_model(spark, rows):
    from bigdata_tag_system_spark.functions.udaf_ops import (
        grouped_weighted_geomean,
    )

    df = spark.createDataFrame(
        [(f"g{k}", v, w) for k, v, w in rows],
        "k string, v double, w double")
    got = {r["k"]: r["w_geomean"] for r in
           grouped_weighted_geomean(df, "k", "v", "w").collect()}

    acc: dict = defaultdict(lambda: [0.0, 0.0])
    for k, v, w in rows:
        acc[f"g{k}"][0] += math.log(v) * w
        acc[f"g{k}"][1] += w
    import pytest

    for k, (s, tot) in acc.items():
        assert got[k] == pytest.approx(math.exp(s / tot), rel=1e-9)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
             min_size=1, max_size=10),
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20),
                       st.integers(-5, 5)),
             min_size=0, max_size=10))
def test_asof_cogrouped_and_coarrow_match_brute_model(spark, lrows, rrows):
    # brute model: latest right (key, rts <= ts); ties at equal rts
    # resolve to the GREATEST value (the documented struct-order rule)
    from bigdata_tag_system_spark.operators.timeseries import (
        asof_join_coarrow, asof_join_cogrouped,
    )

    left = spark.createDataFrame(
        [(i, f"k{k}", t) for i, (k, t) in enumerate(lrows)],
        "event_id int, user_id string, ts int")
    right = spark.createDataFrame(
        [(f"k{k}", t, float(v)) for k, t, v in rrows],
        "user_id string, ts int, value double")

    want = {}
    for i, (k, t) in enumerate(lrows):
        cands = [(rt, v) for rk, rt, v in rrows if rk == k and rt <= t]
        want[i] = float(max(cands)[1]) if cands else None

    for fn in (asof_join_cogrouped, asof_join_coarrow):
        got = {r["event_id"]: r["value_asof"] for r in
               fn(left, right, value_cols=["value"]).collect()}
        assert got == want, fn.__name__


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(0, 3),
              st.floats(-50.0, 50.0, allow_nan=False)),
    min_size=1, max_size=25))
def test_arrow_zscore_matches_stats_model(spark, rows):
    from bigdata_tag_system_spark.operators.features import (
        normalize_per_user_arrow,
    )

    data = [(f"u{k}", i, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "user_id string, event_id int, value double")
    got = {r["event_id"]: r["value_z"] for r in
           normalize_per_user_arrow(df).collect()}

    groups: dict = defaultdict(list)
    for u, i, v in data:
        groups[u].append((i, v))
    for u, pairs in groups.items():
        vals = [v for _, v in pairs]
        n = len(vals)
        mean = sum(vals) / n
        var = (sum((v - mean) ** 2 for v in vals) / (n - 1)
               if n > 1 else 0.0)
        std = math.sqrt(var)
        for i, v in pairs:
            want = 0.0 if std == 0.0 else (v - mean) / std
            assert abs(got[i] - want) < 1e-9
