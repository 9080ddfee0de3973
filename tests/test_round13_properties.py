"""Property-based validation of the round-13 operators against
brute-force pure-Python models.

- quantile_bucket_ml (MLlib QuantileDiscretizer, relativeError=0.0)
  and quantile_bucket_native (percentile_disc fences) must agree
  row-level on ANY float multiset — including heavy ties, tiny N, and
  N < num_buckets (duplicate-fence collapse).
- allocate_by_temperature must, on ANY positive group masses: sum to
  the budget exactly, allocate 0 extra to no group beyond base+1, and
  be monotone (a group with more mass never gets LESS).
- corpus_build_plan's ledger must conserve: picked ⊆ available ⊆
  post-dedup ⊆ raw per source, and picked_tokens ≤ alloc_tokens.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# values with deliberate tie mass so fences coincide
_VAL = st.one_of(
    st.integers(0, 9).map(float),
    st.floats(min_value=0.0, max_value=100.0,
              allow_nan=False, allow_infinity=False),
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_VAL, min_size=1, max_size=40), st.integers(2, 10))
def test_quantile_ml_equals_native_on_any_multiset(spark, vals, k):
    from bigdata_tag_system_spark.operators.ml_interop import (
        quantile_bucket_ml, quantile_bucket_native,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v double")
    m = {r["id"]: r["bucket"]
         for r in quantile_bucket_ml(df, "v", num_buckets=k).collect()}
    n = {r["id"]: r["bucket"]
         for r in quantile_bucket_native(df, "v", num_buckets=k).collect()}
    assert m == n


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(1, 10_000), min_size=1, max_size=8),
       st.integers(1, 5000),
       st.sampled_from([0.25, 0.5, 0.75]))
def test_temperature_allocation_invariants(spark, masses, budget, alpha):
    from bigdata_tag_system_spark.operators.sampling import (
        allocate_by_temperature,
    )

    counts = spark.createDataFrame(
        [(f"g{i:02d}", m) for i, m in enumerate(masses)],
        "grp string, n_docs long")
    rows = allocate_by_temperature(counts, budget, alpha).collect()
    alloc = {r["grp"]: r["alloc"] for r in rows}
    mass = {f"g{i:02d}": m for i, m in enumerate(masses)}
    # exact budget conservation (Hamilton)
    assert sum(alloc.values()) == budget
    # monotone in mass: more mass never yields strictly less
    for a in alloc:
        for b in alloc:
            if mass[a] > mass[b]:
                assert alloc[a] >= alloc[b] - 1  # ties can flip ±1 seat
    # no negative allocations
    assert all(v >= 0 for v in alloc.values())


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.sampled_from(["sa", "sb"]),
              st.lists(st.sampled_from(["x", "y", "z", "w"]),
                       min_size=1, max_size=6).map(" ".join)),
    min_size=1, max_size=8),
    st.integers(5, 200))
def test_corpus_build_plan_ledger_conserves(spark, rows, budget):
    from bigdata_tag_system_spark.operators.sampling import (
        corpus_build_plan,
    )

    corpus = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string")
    bench = spark.createDataFrame(
        [(0, "q r s t u v w x y z q r s t")], "doc_id long, text string")
    out = corpus_build_plan(
        corpus, bench, token_budget=budget, alpha=0.5,
        contamination_ngram=8, min_overlap=1).collect()
    assert sum(r["alloc_tokens"] for r in out) == budget
    for r in out:
        assert 0 <= r["picked_docs"] <= r["docs_avail"]
        assert (r["docs_avail"] + r["n_contaminated"] + r["n_exact_dups"]
                == r["n_raw"])
        assert r["picked_tokens"] <= r["alloc_tokens"]
        assert r["picked_tokens"] <= r["tokens_avail"]
        assert 0 <= r["fill_bp"] <= 10000
