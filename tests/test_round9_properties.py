"""Property-based validation of the round-9 operators against
pure-Python models: additive aggregate merging must equal the full-scan
aggregate for ANY split of ANY fact set, and blocked sorted-neighborhood
candidates must match a brute-force replay of the sort-window semantics.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


class TestAdditiveMergeProperty:
    @given(
        facts=st.lists(
            st.tuples(st.sampled_from("abcd"),
                      st.integers(min_value=-50, max_value=50)),
            min_size=1, max_size=30),
        cut=st.integers(min_value=0, max_value=30),
    )
    @settings(**_SETTINGS)
    def test_split_merge_equals_full_aggregate(self, spark, facts, cut):
        from bigdata_tag_system_spark.operators.merge import (
            merge_additive_aggregates,
        )

        cut = min(cut, len(facts))
        df = spark.createDataFrame(
            [(i, k, v) for i, (k, v) in enumerate(facts)],
            "i long, k string, v long")

        def agg(d):
            return d.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                F.max("v").alias("mx"), F.min("v").alias("mn"))

        left, right = df.where(f"i < {cut}"), df.where(f"i >= {cut}")
        if left.count() == 0 or right.count() == 0:
            return  # merge needs two real slices; trivial splits skip
        merged = merge_additive_aggregates(
            agg(left), agg(right), ["k"], sum_cols=["s"], count_col="n",
            max_cols=["mx"], min_cols=["mn"])
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, agg(df).collect()))


def _py_snm(docs: list[str | None], window: int, block_chars: int):
    """Brute-force blocked sorted-neighborhood model."""
    keyed = []
    for i, text in enumerate(docs):
        if text is None:
            continue
        k = re.sub(r"\s+", " ", text.lower()).strip()
        if k == "":
            continue
        keyed.append((k[:block_chars], k, i))
    out = set()
    blocks: dict[str, list[tuple[str, int]]] = {}
    for blk, k, i in keyed:
        blocks.setdefault(blk, []).append((k, i))
    for members in blocks.values():
        members.sort()
        for pos, (_, i) in enumerate(members):
            for d in range(1, window + 1):
                if pos + d < len(members):
                    out.add((i, members[pos + d][1], d))
    return out


class TestSortedNeighborhoodProperty:
    @given(
        docs=st.lists(
            st.one_of(
                st.none(),
                st.text(alphabet="ab c", min_size=0, max_size=8)),
            min_size=2, max_size=15),
        window=st.integers(min_value=1, max_value=4),
    )
    @settings(**_SETTINGS)
    def test_matches_brute_force_model(self, spark, docs, window):
        from bigdata_tag_system_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)],
            "doc_id long, text string")
        got = {(r["id_a"], r["id_b"], r["rank_distance"])
               for r in sorted_neighborhood_pairs(
                   df, window=window, block_chars=3).collect()}
        assert got == _py_snm(docs, window, 3)


class TestWeightedPercentileProperty:
    @given(
        items=st.lists(
            st.tuples(st.integers(min_value=-20, max_value=20),
                      st.integers(min_value=1, max_value=9)),
            min_size=1, max_size=20),
        p=st.sampled_from([10, 25, 50, 75, 90, 100]),
    )
    @settings(**_SETTINGS)
    def test_matches_expanded_multiset_model(self, spark, items, p):
        """The weighted percentile must equal the same lower-convention
        percentile of the EXPANDED multiset (each value repeated
        weight times) — weights are just run-length compression."""
        from bigdata_tag_system_spark.operators.features import (
            weighted_percentiles,
        )

        df = spark.createDataFrame(
            [("g", float(v), w) for v, w in items],
            "g string, v double, w long")
        out = weighted_percentiles(
            df, "v", "w", "g", pcts=(p,)).collect()[0]

        expanded = sorted(
            float(v) for v, w in items for _ in range(w))
        total = len(expanded)
        # smallest value whose 1-based rank r satisfies 100·r ≥ p·W
        target = next(x for i, x in enumerate(expanded)
                      if 100 * (i + 1) >= p * total)
        assert out[f"p{p}"] == target
        assert out["total_weight"] == total


class TestParetoFrontierProperty:
    @given(
        pts=st.lists(
            st.tuples(st.integers(min_value=0, max_value=8),
                      st.integers(min_value=0, max_value=8)),
            min_size=1, max_size=25),
    )
    @settings(**_SETTINGS)
    def test_matches_weak_dominance_model(self, spark, pts):
        from bigdata_tag_system_spark.operators.features import (
            pareto_frontier,
        )

        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)],
            "id long, x long, y long")
        got = sorted((r["x"], r["y"], r["id"])
                     for r in pareto_frontier(df, "x", "y").collect())
        brute = sorted(
            (x, y, i) for i, (x, y) in enumerate(pts)
            if not any(q[0] >= x and q[1] >= y and q != (x, y)
                       for q in pts))
        assert got == brute


class TestJackknifeProperty:
    @given(
        units=st.lists(
            st.tuples(st.integers(min_value=-9, max_value=9),
                      st.integers(min_value=1, max_value=9)),
            min_size=2, max_size=15),
    )
    @settings(**_SETTINGS)
    def test_matches_materialized_replicates(self, spark, units):
        from bigdata_tag_system_spark.operators.features import (
            jackknife_ratio_se,
        )

        # leave-one-out denominators must stay positive
        rows = [(i, float(n), float(d))
                for i, (n, d) in enumerate(units)]
        df = spark.createDataFrame(
            rows, "u long, num double, den double")
        out = jackknife_ratio_se(df, "num", "den", "u").collect()[0]

        sn = sum(n for _, n, _ in rows)
        sd = sum(d for _, _, d in rows)
        reps = [(sn - n) / (sd - d) for _, n, d in rows]
        g = len(reps)
        rbar = sum(reps) / g
        se = ((g - 1) / g * sum((r - rbar) ** 2 for r in reps)) ** 0.5
        assert out["n_units"] == g
        assert abs(out["se_jack"] - se) < 5e-5


class TestMutualInformationProperty:
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from("abc"), st.sampled_from("xy")),
            min_size=2, max_size=30),
    )
    @settings(**_SETTINGS)
    def test_matches_closed_form_and_bounds(self, spark, rows):
        import math
        from collections import Counter

        from bigdata_tag_system_spark.operators.features import (
            mutual_information,
        )

        df = spark.createDataFrame(rows, "f string, y string")
        out = mutual_information(df, ["f"], "y").collect()[0]

        n = len(rows)
        joint = Counter(rows)
        fx = Counter(f for f, _ in rows)
        fy = Counter(y for _, y in rows)
        mi = sum(c / n * math.log(c * n / (fx[f] * fy[y]))
                 for (f, y), c in joint.items())
        hx = -sum(c / n * math.log(c / n) for c in fx.values())
        hy = -sum(c / n * math.log(c / n) for c in fy.values())
        assert abs(out["mi_nats"] - mi) < 5e-6
        assert abs(out["h_feature"] - hx) < 5e-6
        # information inequality: 0 ≤ MI ≤ min(H(X), H(Y)) (+ε slack)
        assert -1e-9 <= mi <= min(hx, hy) + 1e-9


class TestModularityProperty:
    @given(
        edges=st.lists(
            st.tuples(st.integers(min_value=0, max_value=7),
                      st.integers(min_value=0, max_value=7)),
            min_size=1, max_size=20),
        labels=st.lists(st.integers(min_value=0, max_value=2),
                        min_size=8, max_size=8),
    )
    @settings(**_SETTINGS)
    def test_matches_definition_and_bounds(self, spark, edges, labels):
        from bigdata_tag_system_spark.operators.graph import modularity

        und = sorted({(min(a, b), max(a, b))
                      for a, b in edges if a != b})
        if not und:
            return
        nodes = sorted({n for e in und for n in e})
        lab = {n: labels[n] for n in nodes}
        m = len(und)

        # closed-form Q from the definition
        deg: dict[int, int] = {}
        for a, b in und:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        comms = sorted(set(lab.values()))
        q_true = 0.0
        for c in comms:
            ec = sum(1 for a, b in und
                     if lab[a] == c and lab[b] == c)
            dc = sum(d for n, d in deg.items() if lab[n] == c)
            q_true += ec / m - (dc / (2 * m)) ** 2

        e_df = spark.createDataFrame(und, "src long, dst long")
        l_df = spark.createDataFrame(
            [(n, lab[n]) for n in nodes], "node long, label long")
        out = modularity(e_df, l_df).collect()[0]
        assert out["modularity"] == __import__("pytest").approx(
            q_true, abs=1e-6)
        # Newman bounds
        assert -0.5 - 1e-9 <= out["modularity"] <= 1.0 + 1e-9


class TestMarkovAttributionProperty:
    @given(
        journeys=st.lists(
            st.lists(st.sampled_from(["view", "click", "purchase"]),
                     min_size=1, max_size=4),
            min_size=1, max_size=8),
    )
    @settings(**_SETTINGS)
    def test_probabilities_and_shares_well_formed(self, spark, journeys):
        import datetime as dt

        from bigdata_tag_system_spark.operators.features import (
            markov_attribution,
        )

        # one session per journey: users far apart, events 1 min apart
        rows = []
        eid = 0
        for u, j in enumerate(journeys):
            t0 = dt.datetime(2024, 1, 1, 8, 0, 0)
            for i, typ in enumerate(j):
                eid += 1
                rows.append((eid, t0 + dt.timedelta(minutes=i),
                             u + 1, typ, 1.0, None))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double, props string")
        out = markov_attribution(df).collect()
        assert all(0.0 <= r["p_conv_base"] <= 1.0 for r in out)
        assert all(0.0 <= r["removal_effect"] <= 1.0 for r in out)
        shares = [r["attribution_share"] for r in out]
        if shares and shares[0] is not None:
            assert abs(sum(shares) - 1.0) < 1e-3
        # nothing converts → p must read 0 and no channel earns credit
        # (NOTE: the converse claim — "a channel absent from every
        # converting prefix earns nothing" — is FALSE for a first-order
        # chain, which legitimately mixes transitions across journeys)
        if not any("purchase" in j for j in journeys):
            assert all(r["p_conv_base"] == 0.0 for r in out)
            assert all(r["removal_effect"] == 0.0 for r in out)
