"""Round-9 operators: blocked sorted-neighborhood candidates,
functional-dependency audit, readability census, incremental additive
aggregate maintenance, embedding dimension-variance spectrum."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


class TestSortedNeighborhood:
    def _docs(self, spark):
        rows = [
            (1, "alpha report version one"),
            (2, "alpha report version two"),
            (3, "alpha report version three"),
            (4, "zeta entirely different text"),
            (5, "zeta entirely different texts"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_prefix_neighbors_pair_within_window(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        out = sorted_neighborhood_pairs(
            self._docs(spark), window=2, block_chars=4)
        pairs = {(r["id_a"], r["id_b"]): r["rank_distance"]
                 for r in out.collect()}
        # 'alph' block sorts 1 < 3 < 2 (one/three/two lexicographic)
        assert pairs[(1, 3)] == 1 and pairs[(3, 2)] == 1
        assert pairs[(1, 2)] == 2
        # 'zeta' block pairs internally, never across blocks
        assert (4, 5) in pairs
        assert not any(a in (1, 2, 3) and b in (4, 5)
                       for a, b in pairs)

    def test_window_bounds_candidate_volume(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        docs = spark.createDataFrame(
            [(i, f"same prefix item {i:03d}") for i in range(20)],
            "doc_id long, text string")
        out = sorted_neighborhood_pairs(docs, window=3, block_chars=4)
        n = out.count()
        # one block of 20 rows, window 3: 3*20 - (1+2+3) tail losses
        assert n == 3 * 20 - 6
        assert out.where("rank_distance > 3").count() == 0

    def test_null_and_empty_text_excluded(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        docs = spark.createDataFrame(
            [(1, "abcd x"), (2, "abcd y"), (3, None), (4, "   ")],
            "doc_id long, text string")
        out = sorted_neighborhood_pairs(docs, window=5).collect()
        ids = {r["id_a"] for r in out} | {r["id_b"] for r in out}
        assert ids == {1, 2}

    def test_bad_window_raises(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            sorted_neighborhood_pairs,
        )

        with pytest.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(self._docs(spark), window=0)


class TestFdViolations:
    def test_holding_and_violated_fds(self, spark):
        from bigdata_tag_system_spark.operators.quality import fd_violations

        df = spark.createDataFrame(
            [(1, "a", 10), (1, "a", 11), (2, "b", 20), (3, "b", 30),
             (3, "c", 31)],
            "k long, v string, x long")
        out = {r["fd"]: r for r in fd_violations(
            df, [(["k"], "v"), (["v"], "k")]).collect()}
        holds = out["k -> v"]
        assert holds["n_violating_keys"] == 1        # k=3 -> {b, c}
        assert holds["n_keys"] == 3
        assert holds["n_rows"] == 5
        assert holds["max_rhs_values"] == 2
        violated = out["v -> k"]
        assert violated["n_violating_keys"] == 1     # v=b -> {2, 3}

    def test_null_rhs_counts_as_observed_state(self, spark):
        from bigdata_tag_system_spark.operators.quality import fd_violations

        df = spark.createDataFrame(
            [(1, "a"), (1, None), (2, None)], "k long, v string")
        out = fd_violations(df, [(["k"], "v")]).collect()[0]
        # k=1 maps to {a, NULL} -> violating; k=2 maps to {NULL} -> fine
        assert out["n_violating_keys"] == 1
        assert out["max_rhs_values"] == 2

    def test_composite_lhs_and_empty_deps(self, spark):
        from bigdata_tag_system_spark.operators.quality import fd_violations

        df = spark.createDataFrame(
            [(1, 1, "x"), (1, 2, "y"), (1, 1, "x")],
            "a long, b long, v string")
        out = fd_violations(df, [(["a", "b"], "v")]).collect()[0]
        assert out["fd"] == "a,b -> v"
        assert out["n_violating_keys"] == 0
        with pytest.raises(ValueError, match="non-empty"):
            fd_violations(df, [])


class TestReadability:
    def test_hand_computed_components(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            readability_scores,
        )

        df = spark.createDataFrame(
            [(1, "The cat sat. It ran away!"),
             (2, "word"),
             (3, None),
             (4, "")],
            "doc_id long, text string")
        out = {r["doc_id"]: r for r in readability_scores(df).collect()}
        assert set(out) == {1, 2}            # null/empty filtered
        r1 = out[1]
        assert r1["n_words"] == 6
        assert r1["n_sentences"] == 2
        # vowel groups: e/a/a/i/a/a/ay -> the(1) cat(1) sat(1) it(1)
        # ran(1) away(2) = 7
        assert r1["n_syllable_groups"] == 7
        flesch = 206.835 - 1.015 * (6 / 2) - 84.6 * (7 / 6)
        assert abs(r1["flesch"] - round(flesch, 2)) < 1e-9
        # single word, no terminator: sentences floored at 1
        assert out[2]["n_sentences"] == 1


class TestMergeAdditiveAggregates:
    def _slices(self, spark):
        store = spark.createDataFrame(
            [("a", 3, 300, 150, 10), ("b", 2, 200, 180, 20)],
            "k string, n long, s long, mx long, mn long")
        delta = spark.createDataFrame(
            [("a", 2, 100, 90, 5), ("c", 1, 50, 50, 50)],
            "k string, n long, s long, mx long, mn long")
        return store, delta

    def test_update_insert_keep(self, spark):
        from bigdata_tag_system_spark.operators.merge import (
            merge_additive_aggregates,
        )

        store, delta = self._slices(spark)
        out = {r["k"]: r for r in merge_additive_aggregates(
            store, delta, ["k"], sum_cols=["s"], count_col="n",
            max_cols=["mx"], min_cols=["mn"]).collect()}
        assert out["a"]["n"] == 5 and out["a"]["s"] == 400
        assert out["a"]["mx"] == 150 and out["a"]["mn"] == 5
        assert out["b"]["n"] == 2 and out["b"]["s"] == 200   # untouched
        assert out["c"]["n"] == 1 and out["c"]["mx"] == 50   # inserted

    def test_equals_full_aggregate(self, spark):
        from bigdata_tag_system_spark.operators.merge import (
            merge_additive_aggregates,
        )

        facts = spark.createDataFrame(
            [(i, f"k{i % 3}", i * 7 % 50) for i in range(40)],
            "i long, k string, v long")

        def agg(df):
            return df.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
                F.max("v").alias("mx"), F.min("v").alias("mn"))

        merged = merge_additive_aggregates(
            agg(facts.where("i < 25")), agg(facts.where("i >= 25")),
            ["k"], sum_cols=["s"], count_col="n",
            max_cols=["mx"], min_cols=["mn"])
        full = agg(facts)
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, full.collect()))

    def test_duplicate_role_and_empty_roles_raise(self, spark):
        from bigdata_tag_system_spark.operators.merge import (
            merge_additive_aggregates,
        )

        store, delta = self._slices(spark)
        with pytest.raises(ValueError, match="twice"):
            merge_additive_aggregates(
                store, delta, ["k"], sum_cols=["s"], max_cols=["s"])
        with pytest.raises(ValueError, match="at least one"):
            merge_additive_aggregates(store, delta, ["k"])


class TestDimensionVariance:
    def test_planted_high_variance_dim_ranks_first(self, spark):
        from bigdata_tag_system_spark.operators.embeddings import (
            dimension_variance_report,
        )

        rows = [(i, [0.5, float(i % 10), 0.1 * (i % 2)])
                for i in range(50)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        out = dimension_variance_report(df, top_m=3).collect()
        assert out[0]["dim"] == 1                 # the 0..9 spread
        assert out[0]["variance"] > out[1]["variance"]
        assert out[-1]["variance"] == 0.0         # constant dim 0 last
        total_bp = sum(r["share_bp"] for r in out)
        assert 0 <= total_bp <= 10000


class TestAdditiveStoreSink:
    def test_batches_merge_and_replays_skip(self, spark, tmp_path):
        from bigdata_tag_system_spark.streaming.incremental import (
            additive_store_sink,
        )

        store = str(tmp_path / "store")

        def partials(batch):
            return batch.groupBy("k").agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))

        sink = additive_store_sink(
            partials, store, ["k"], sum_cols=["s"], count_col="n")
        b0 = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)],
                                   "k string, v long")
        b1 = spark.createDataFrame([("a", 10), ("c", 5)],
                                   "k string, v long")
        sink(b0, 0)
        sink(b1, 1)
        got = {r["k"]: (r["n"], r["s"]) for r in
               spark.read.parquet(store).collect()}
        assert got == {"a": (3, 13), "b": (1, 3), "c": (1, 5)}
        # at-least-once: re-delivery of batch 1 must NOT double-apply
        sink(b1, 1)
        again = {r["k"]: (r["n"], r["s"]) for r in
                 spark.read.parquet(store).collect()}
        assert again == got
        # a NEW batch id still applies
        sink(b1, 2)
        final = {r["k"]: (r["n"], r["s"]) for r in
                 spark.read.parquet(store).collect()}
        assert final["a"] == (4, 23) and final["c"] == (2, 10)


class TestCandidateRecallReport:
    def test_generic_blocker_eval(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            candidate_recall_report,
        )

        exact = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6)], "id_a long, id_b long")
        cand = spark.createDataFrame(
            [(1, 2), (3, 4), (7, 8), (9, 10)], "id_a long, id_b long")
        r = candidate_recall_report(cand, exact).collect()[0]
        assert (r["n_exact"], r["n_candidates"], r["n_hits"]) == (3, 4, 2)
        assert r["recall_bp"] == 6666       # (10000*2) DIV 3
        assert r["precision_bp"] == 5000

    def test_empty_candidates(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            candidate_recall_report,
        )

        exact = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        empty = exact.where("id_a < 0")
        r = candidate_recall_report(empty, exact).collect()[0]
        assert r["n_hits"] == 0 and r["precision_bp"] is None
        assert r["recall_bp"] == 0


class TestSrpPairs:
    def test_identical_vectors_always_collide_and_verify(self, spark):
        from bigdata_tag_system_spark.operators.embeddings import (
            srp_candidate_pairs, srp_hyperplanes,
        )

        planes = srp_hyperplanes(dim=4, n_bits=8, seed=3)
        rows = [(1, [0.5, -0.2, 0.8, 0.1]),
                (2, [0.5, -0.2, 0.8, 0.1]),     # exact copy of 1
                (3, [-0.5, 0.2, -0.8, -0.1]),   # antipode of 1
                (4, [9.0, 8.0, 7.0, 6.0])]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        out = {(r["id_a"], r["id_b"]): r["cosine"] for r in
               srp_candidate_pairs(df, planes, bands=4,
                                   min_cosine=0.9).collect()}
        # identical text -> identical signature -> every chunk collides,
        # cosine 1.0 passes the verify
        assert (1, 2) in out and abs(out[(1, 2)] - 1.0) < 1e-9
        # the antipode flips every bit; even if a chunk collided, the
        # exact verify (cosine -1) must reject it
        assert not any(3 in p for p in out)

    def test_hyperplanes_deterministic_and_bands_validated(self, spark):
        from bigdata_tag_system_spark.operators.embeddings import (
            srp_candidate_pairs, srp_hyperplanes,
        )

        assert srp_hyperplanes(8, 16, seed=7) == srp_hyperplanes(
            8, 16, seed=7)
        assert srp_hyperplanes(8, 16, seed=7) != srp_hyperplanes(
            8, 16, seed=8)
        df = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="bands"):
            srp_candidate_pairs(df, srp_hyperplanes(2, 8), bands=3)

    def test_srp_recall_on_planted_clusters(self, spark):
        import math

        from bigdata_tag_system_spark.operators.dedup import (
            candidate_recall_report,
        )
        from bigdata_tag_system_spark.operators.embeddings import (
            srp_candidate_pairs, srp_hyperplanes,
        )

        # 10 tight clusters of 3 near-identical vectors: in-cluster
        # cosine ~0.999 -> per-bit agreement ~1, so banding recall on
        # TRUE near-dups should be essentially total
        rows = []
        for c in range(10):
            base = [math.cos(0.6 * c + 0.05 * d) for d in range(8)]
            for m in range(3):
                rows.append((c * 10 + m,
                             [x + 0.001 * m for x in base]))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        planes = srp_hyperplanes(dim=8, n_bits=16, seed=7)
        got = srp_candidate_pairs(df, planes, bands=4, min_cosine=0.99)
        exact = spark.createDataFrame(
            [(c * 10 + a, c * 10 + b)
             for c in range(10) for a in range(3) for b in range(3)
             if a < b],
            "id_a long, id_b long")
        r = candidate_recall_report(got, exact).collect()[0]
        assert r["n_exact"] == 30
        assert r["recall_bp"] == 10000   # every planted pair caught


class TestTemporalPurgedSplit:
    def test_gap_rows_dropped_and_fences_respected(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            temporal_purged_split,
        )

        rows = [(1, "2024-01-01 00:00:00"), (2, "2024-01-17 23:59:59"),
                (3, "2024-01-18 00:00:00"),   # inside the embargo gap
                (4, "2024-01-19 12:00:00"),   # inside the gap
                (5, "2024-01-20 00:00:00"),   # first test row
                (6, "2024-01-25 00:00:00")]
        df = spark.createDataFrame(
            rows, "id long, ts string").select(
            "id", F.to_timestamp("ts").alias("ts"))
        out = {r["id"]: r["split"] for r in temporal_purged_split(
            df, "ts", "2024-01-18", embargo="2 days").collect()}
        assert out == {1: "train", 2: "train", 5: "test", 6: "test"}

    def test_zero_embargo_is_plain_temporal_split(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            temporal_purged_split,
        )

        df = spark.createDataFrame(
            [(1, "2024-01-17 00:00:00"), (2, "2024-01-18 00:00:00")],
            "id long, ts string").select(
            "id", F.to_timestamp("ts").alias("ts"))
        out = {r["id"]: r["split"] for r in temporal_purged_split(
            df, "ts", "2024-01-18").collect()}
        assert out == {1: "train", 2: "test"}


class TestWinsorizedStats:
    def test_hand_computed_fences_and_clamps(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            winsorized_stats,
        )

        # values 0..100: p05 = 5.0, p95 = 95.0 (continuous percentile
        # over 101 evenly spaced points is exact)
        df = spark.createDataFrame(
            [(float(i),) for i in range(101)], "value double")
        r = winsorized_stats(df, "value",
                             lower_pct=0.05, upper_pct=0.95).collect()[0]
        assert r["fence_lo"] == 5.0 and r["fence_hi"] == 95.0
        assert r["n_clamped_low"] == 5 and r["n_clamped_high"] == 5
        assert r["raw_mean"] == 50.0
        # winsorized mean: tails (0..4 -> 5, 96..100 -> 95) symmetric,
        # so the mean stays 50
        assert r["winsorized_mean"] == 50.0

    def test_grouped_fences_are_per_group(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            winsorized_stats,
        )

        rows = [("a", float(i)) for i in range(11)]
        rows += [("b", float(100 + i)) for i in range(11)]
        df = spark.createDataFrame(rows, "g string, value double")
        out = {r["g"]: r for r in winsorized_stats(
            df, "value", "g", 0.1, 0.9).collect()}
        assert out["a"]["fence_lo"] == 1.0 and out["a"]["fence_hi"] == 9.0
        assert out["b"]["fence_lo"] == 101.0


class TestKAnonymity:
    def test_hand_built_groups_and_l_diversity(self, spark):
        from bigdata_tag_system_spark.operators.quality import (
            k_anonymity_report,
        )

        rows = [("US", "A", "x")] * 5 + [("US", "B", "x")] * 2 \
            + [("DE", "A", "y")]
        df = spark.createDataFrame(
            rows, "country string, seg string, diag string")
        r = k_anonymity_report(
            df, ["country", "seg"], k=5, sensitive_col="diag").collect()[0]
        assert r["n_groups"] == 3
        assert r["n_groups_below_k"] == 2        # (US,B)=2, (DE,A)=1
        assert r["rows_at_risk"] == 3
        assert r["min_group_size"] == 1
        # the big (US,A) group is k-anonymous but has ONE sensitive
        # value -> l-diversity floor is 1: k alone hides the leak
        assert r["min_l_diversity"] == 1

    def test_validation(self, spark):
        from bigdata_tag_system_spark.operators.quality import (
            k_anonymity_report,
        )

        df = spark.createDataFrame([("a",)], "x string")
        with pytest.raises(ValueError, match="k must"):
            k_anonymity_report(df, ["x"], k=0)
        with pytest.raises(ValueError, match="non-empty"):
            k_anonymity_report(df, [], k=5)


class TestRollingOriginFolds:
    def test_memberships_overlap_across_folds(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            rolling_origin_folds,
        )

        rows = [(1, "2024-01-05 00:00:00"),   # train f0, f1
                (2, "2024-01-13 00:00:00"),   # test f0, train f1
                (3, "2024-01-21 00:00:00")]   # beyond f0 horizon, test f1
        df = spark.createDataFrame(rows, "id long, ts string").select(
            "id", F.to_timestamp("ts").alias("ts"))
        out = {(r["id"], r["fold_id"]): r["split"]
               for r in rolling_origin_folds(
                   df, "ts", ["2024-01-12", "2024-01-20"],
                   horizon="3 days").collect()}
        assert out[(1, 0)] == "train" and out[(1, 1)] == "train"
        assert out[(2, 0)] == "test" and out[(2, 1)] == "train"
        assert (3, 0) not in out                 # past f0's horizon
        assert out[(3, 1)] == "test"
        from bigdata_tag_system_spark.operators.sampling import (
            rolling_origin_folds as rof,
        )
        with pytest.raises(ValueError, match="non-empty"):
            rof(df, "ts", [])
