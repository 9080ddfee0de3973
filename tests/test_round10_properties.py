"""Property-based validation of the round-10 operators against
brute-force pure-Python models.

- cumulative_distinct_count must equal the prefix-set size at every row
  under ANY (order, id) data shape, including order ties and repeats.
- weighted_reservoir_sample must equal the exact top-k of the
  quantized A-ES keys computed independently in Python (same Knuth
  hash, same log-space key, same tie rule) — the kept SET is a pure
  function of (keys, weights, salt), regardless of partitioning.
- quantile_normalize ranks must be the (value, id) sort positions.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_MOD = 4294967296
_A = 2654435761


def _knuth(k: int, salt: int = 0) -> int:
    return (((k + salt) % (_MOD // 2)) * _A) % _MOD


def _es_key(k: int, w: float) -> float:
    u = (_knuth(k) + 0.5) / float(_MOD)
    return math.floor(math.log(u) / w * 1e9 + 0.5) / 1e9


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(0, 9),          # part
              st.integers(0, 5),          # order (ties likely)
              st.sampled_from("abcd")),   # value
    min_size=1, max_size=40))
def test_cumulative_distinct_matches_prefix_sets(spark, rows):
    from bigdata_tag_system_spark.operators.features import (
        cumulative_distinct_count,
    )

    data = [(i, p, o, v) for i, (p, o, v) in enumerate(rows)]
    df = spark.createDataFrame(
        data, "id long, p long, o long, v string")
    out = cumulative_distinct_count(
        df.repartition(5), "v", "o", "id", part_col="p").collect()
    got = {r["id"]: r["cum_distinct"] for r in out}
    # brute: per partition, walk rows in (o, id) order with a set
    by_part: dict[int, list[tuple[int, int, str]]] = {}
    for i, p, o, v in data:
        by_part.setdefault(p, []).append((o, i, v))
    want = {}
    for p, items in by_part.items():
        seen: set[str] = set()
        for o, i, v in sorted(items):
            seen.add(v)
            want[i] = len(seen)
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.floats(0.5, 100.0, allow_nan=False), min_size=1,
                max_size=30),
       st.integers(1, 8))
def test_weighted_reservoir_matches_brute_topk(spark, weights, k):
    from bigdata_tag_system_spark.operators.sampling import (
        weighted_reservoir_sample,
    )

    data = [(i, float(w)) for i, w in enumerate(weights)]
    df = spark.createDataFrame(data, "k long, w double")
    kept = [r["k"] for r in
            weighted_reservoir_sample(df.repartition(4), k, "w", "k")
            .collect()]
    brute = sorted(data, key=lambda t: (-_es_key(t[0], t[1]), t[0]))
    assert kept == [i for i, _ in brute[:k]]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.integers(-5, 5), min_size=1, max_size=30))
def test_quantile_normalize_ranks_are_sort_positions(spark, vals):
    from bigdata_tag_system_spark.operators.features import (
        quantile_normalize,
    )

    data = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(data, "id long, v double")
    out = quantile_normalize(df.repartition(3), "v", "id").collect()
    order = [i for i, _ in sorted(data, key=lambda t: (t[1], t[0]))]
    want_rank = {i: pos + 1 for pos, i in enumerate(order)}
    n = len(data)
    for r in out:
        assert r["q_uniform_rank"] == want_rank[r["id"]]
        assert r["q_uniform"] == want_rank[r["id"]] / (n + 1)
