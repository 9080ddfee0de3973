"""Property-based validation of the round-11 operators against
brute-force pure-Python models.

- pagerank_literal must equal a from-scratch Python power iteration on
  ANY small weighted digraph (and therefore the distributed operator,
  whose agreement is pinned separately in test_round11_ops).
- image_ahash_bands bits must equal the integer mean-threshold model
  on ANY 8x8 raster, and ahash_near_pairs must equal brute-force
  hamming pairs at d <= 3 (the pigeonhole-lossless banding claim).
- cumulative_distinct_count with NULLs must equal the prefix-set model
  that IGNORES NULLs (the r11 semantics fix).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(
    st.tuples(st.integers(0, 6), st.integers(0, 6),
              st.integers(1, 9)),
    min_size=1, max_size=25))
def test_pagerank_literal_matches_python_model(spark, edges):
    from collections import defaultdict

    from bigdata_tag_system_spark.operators.graph import pagerank_literal

    df = spark.createDataFrame(
        [(f"n{u}", f"n{v}", float(w)) for u, v, w in edges],
        "src string, dst string, w double")
    got = {r["node"]: r["rank"] for r in
           pagerank_literal(df, weight="w", iterations=6).collect()}

    out_tot: dict = defaultdict(float)
    w_uv: dict = defaultdict(float)
    nodes = set()
    for u, v, w in edges:
        out_tot[f"n{u}"] += w
        w_uv[(f"n{u}", f"n{v}")] += w
        nodes.add(f"n{u}")
        nodes.add(f"n{v}")
    n = len(nodes)
    rank = {x: 1.0 / n for x in nodes}
    for _ in range(6):
        contrib: dict = defaultdict(float)
        for (u, v), w in sorted(w_uv.items()):
            contrib[v] += rank[u] * (w / out_tot[u])
        rank = {x: 0.15 / n + 0.85 * contrib.get(x, 0.0) for x in nodes}
    assert set(got) == nodes
    for x in nodes:
        assert abs(got[x] - rank[x]) < 1e-12


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.lists(st.integers(0, 255), min_size=64, max_size=64),
                min_size=2, max_size=10))
def test_ahash_bits_and_banding_match_brute(spark, rasters):
    from itertools import combinations

    from bigdata_tag_system_spark.operators.multimodal import (
        ahash_near_pairs, image_ahash_bands,
    )

    media = spark.createDataFrame(
        [(m, b"P5\n8 8\n255\n" + bytes(px))
         for m, px in enumerate(rasters)],
        "media_id long, payload binary")
    hashed = image_ahash_bands(media)
    got_h = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
             for r in hashed.collect()}

    want_h = {}
    for m, px in enumerate(rasters):
        s = sum(px)
        bits = [1 if p * 64 > s else 0 for p in px]
        want_h[m] = tuple(
            sum(bits[16 * j + t] << t for t in range(16))
            for j in range(4))
    assert got_h == want_h

    got_pairs = {(r["id_a"], r["id_b"], r["hamming"]) for r in
                 ahash_near_pairs(hashed, max_hamming=3).collect()}

    def ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    want_pairs = {(a, b, ham(want_h[a], want_h[b]))
                  for a, b in combinations(sorted(want_h), 2)
                  if ham(want_h[a], want_h[b]) <= 3}
    assert got_pairs == want_pairs


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.sampled_from(["a", "b", "c", None]),
                min_size=1, max_size=30))
def test_cum_distinct_null_semantics(spark, values):
    from bigdata_tag_system_spark.operators.features import (
        cumulative_distinct_count,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "id long, v string")
    got = {r["id"]: r["cum_distinct"] for r in
           cumulative_distinct_count(
               df.repartition(3), "v", "id", "id").collect()}
    seen: set = set()
    want = {}
    for i, v in enumerate(values):
        if v is not None:
            seen.add(v)
        want[i] = len(seen)
    assert got == want
