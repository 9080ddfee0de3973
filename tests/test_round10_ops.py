"""Round-10 tests: ADVICE-fix regressions (gc_orphans crash-reclaim is
in test_round9b_ops), determinism/overflow sweep guards, and the
reduced-probe label-noise audit added this round."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestFellegiSunterGuards:
    def test_empty_match_pairs_raises_loudly(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            fellegi_sunter_weights,
        )

        recs = spark.createDataFrame(
            [(1, "a", "x"), (2, "a", "y"), (3, "b", "x")],
            "doc_id int, f1 string, f2 string")
        empty_pairs = spark.createDataFrame([], "id_a int, id_b int")
        out = fellegi_sunter_weights(
            recs, empty_pairs,
            {"f1": F.col("f1"), "f2": F.col("f2")})
        with pytest.raises(Exception) as ei:
            out.collect()
        assert "match_pairs" in str(ei.value)

    def test_u_terms_are_decimal_widened(self, spark):
        # the n(n-1) cross-products must be decimal(38,0) BEFORE the
        # multiply — int64 wraps past ~3e9 records otherwise
        from bigdata_tag_system_spark.operators.dedup import (
            fellegi_sunter_weights,
        )

        recs = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b"), (4, "b")],
            "doc_id int, f1 string")
        pairs = spark.createDataFrame([(1, 2)], "id_a int, id_b int")
        out = fellegi_sunter_weights(recs, pairs, {"f1": F.col("f1")})
        row = out.collect()[0]
        # u = sum n_v(n_v-1) / N(N-1) = (2+2)/12 -> 3333 bp
        assert row["u_bp"] == 3333
        assert row["m_bp"] == 10000
        assert row["n_match_pairs"] == 1


class TestLabelNoiseProbeAudit:
    def test_rejects_lossless_and_invalid_nprobe(self, spark):
        from bigdata_tag_system_spark.operators.embeddings import (
            label_noise_probe_audit,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0], "a")],
            "vec_id int, embedding array<double>, label string")
        cents = [[1.0, 0.0], [0.0, 1.0]]
        with pytest.raises(ValueError):
            label_noise_probe_audit(df, cents, nprobe=2)  # = num_buckets
        with pytest.raises(ValueError):
            label_noise_probe_audit(df, cents, nprobe=0)
        with pytest.raises(ValueError):
            label_noise_probe_audit(df, [], nprobe=1)

    def test_agreement_census_bounds_and_exact_twin(self, spark):
        # two tight clusters on orthogonal axes; anchors = the axes.
        # nprobe=1 routes every query to its own cluster only — which
        # here contains all its true neighbors, so the probed census
        # must AGREE 100% with the exact one and the audit proves it.
        from bigdata_tag_system_spark.operators.embeddings import (
            label_noise_probe_audit, label_noise_report,
        )

        rows = []
        for i in range(6):
            rows.append((i, [1.0, 0.01 * i], "x"))
        for i in range(6, 12):
            rows.append((i, [0.01 * (i - 6), 1.0], "y"))
        # one mislabeled vector sitting in the x-cluster
        rows.append((12, [1.0, 0.05], "y"))
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>, label string")
        cents = [[1.0, 0.0], [0.0, 1.0]]

        audit = label_noise_probe_audit(
            df, cents, k=3, nprobe=1).collect()
        by_label = {r["label"]: r for r in audit}
        assert set(by_label) == {"x", "y"}
        # the planted mislabel is a suspect on both sides
        assert by_label["y"]["suspects_exact"] == 1
        assert by_label["y"]["suspects_probed"] == 1
        for r in audit:
            assert 0 <= r["flag_agree_bp"] <= 10000
            assert r["flag_agree_bp"] == 10000  # clusters are separable
            assert (r["mean_mismatch_bp_probed"]
                    == r["mean_mismatch_bp_exact"])
        # exact column of the audit == the lossless census
        census = {r["label"]: r for r in label_noise_report(
            df, k=3, centroids=cents, nprobe=2).collect()}
        for lbl, r in by_label.items():
            assert census[lbl]["suspects"] == r["suspects_exact"]
            assert census[lbl]["n_vecs"] == r["n_vecs"]


class TestWeightedReservoir:
    def test_excludes_nonpositive_weights_and_is_deterministic(
            self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        df = spark.createDataFrame(
            [(i, float(w)) for i, w in
             [(1, 10.0), (2, 0.0), (3, -1.0), (4, 5.0), (5, 20.0)]],
            "k long, w double")
        out1 = weighted_reservoir_sample(df, 2, "w", "k")
        out2 = weighted_reservoir_sample(df.repartition(7), 2, "w", "k")
        kept1 = [r["k"] for r in out1.collect()]
        kept2 = [r["k"] for r in out2.collect()]
        assert kept1 == kept2  # pure function of keys+weights
        assert not {2, 3} & set(kept1)  # w <= 0 excluded
        with pytest.raises(ValueError):
            weighted_reservoir_sample(df, 0, "w", "k")

    def test_inclusion_tracks_weight(self, spark):
        # statistical sanity over salts: a row with 100x the weight of
        # its 9 peers must be kept far more often in k=2 draws
        from bigdata_tag_system_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        rows = [(0, 100.0)] + [(i, 1.0) for i in range(1, 10)]
        df = spark.createDataFrame(rows, "k long, w double")
        hits = 0
        for salt in range(24):
            kept = {r["k"] for r in weighted_reservoir_sample(
                df, 2, "w", "k", salt=salt).collect()}
            assert len(kept) == 2
            hits += 0 in kept
        assert hits >= 18  # heavy row kept in >= 75% of draws

    def test_mergeability(self, spark):
        # top-k of the union == top-k over per-slice top-ks — the
        # property that makes A-ES a streaming reservoir
        from bigdata_tag_system_spark.operators.sampling import (
            weighted_reservoir_sample,
        )

        df = spark.createDataFrame(
            [(i, float(1 + i % 7)) for i in range(100)], "k long, w double")
        full = [r["k"] for r in weighted_reservoir_sample(
            df, 5, "w", "k").collect()]
        a = weighted_reservoir_sample(df.where("k < 50"), 5, "w", "k")
        b = weighted_reservoir_sample(df.where("k >= 50"), 5, "w", "k")
        merged = [r["k"] for r in
                  a.unionByName(b)
                  .orderBy(F.desc("es_key"), "k").limit(5).collect()]
        assert full == merged


class TestArrowBatchNorms:
    def test_norms_and_empty_vector_edge(self, spark):
        import math

        from bigdata_tag_system_spark.operators.embeddings import (
            arrow_batch_norms,
        )

        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, []), (3, [1.0] * 64)],
            "vec_id long, embedding array<double>")
        got = {r["vec_id"]: r["norm9"] for r in
               arrow_batch_norms(df.repartition(3)).collect()}
        assert got[1] == 5.0
        assert got[2] == 0.0  # documented empty-vector behavior
        assert got[3] == math.floor(8.0 * 1e9 + 0.5) / 1e9


class TestPydsStreamReader:
    def test_offsets_chunks_drain_and_replay(self):
        from bigdata_tag_system_spark.sources.pyds import (
            SyntheticEventsStreamReader, _row,
        )

        r = SyntheticEventsStreamReader(rows=250, chunk=100)
        off = r.initialOffset()
        assert off == {"index": 0}
        seen = []
        for want_end in (100, 200, 250):
            rows, off = r.read(off)
            rows = list(rows)
            seen.extend(rows)
            assert off == {"index": want_end}
        assert len(seen) == 250
        # drained-but-open: empty batch, offset pinned
        rows, off2 = r.read(off)
        assert list(rows) == [] and off2 == {"index": 250}
        # at-least-once replay regenerates IDENTICAL rows from offsets
        replay = list(r.readBetweenOffsets({"index": 100},
                                           {"index": 200}))
        assert replay == seen[100:200] == [_row(i)
                                           for i in range(100, 200)]
        with pytest.raises(ValueError):
            SyntheticEventsStreamReader(rows=10, chunk=0)


class TestRakeKeywords:
    def test_hand_scored_corpus(self, spark):
        # "deep learning" occurs twice; each word: freq=2, deg=2(len-1)
        # => wbp=10000 each => phrase score 20000. "neural networks"
        # once: wbp 10000 each => 20000 (ties break on the phrase
        # string). "rocks" is a 1-word phrase: deg 0 => score 0.
        from bigdata_tag_system_spark.operators.text import (
            rake_keywords,
        )

        docs = spark.createDataFrame(
            [(1, "deep learning is the deep learning of neural networks"),
             (2, "it rocks")],
            "doc_id long, text string")
        rows = rake_keywords(docs, top_k=10).collect()
        got = {r["phrase"]: (r["n_words"], r["phrase_freq"],
                             r["score_bp"]) for r in rows}
        assert got["deep learning"] == (2, 2, 20000)
        assert got["neural networks"] == (2, 1, 20000)
        assert got["rocks"] == (1, 1, 0)
        # tie order: score desc, then phrase asc
        assert [r["phrase"] for r in rows[:2]] == [
            "deep learning", "neural networks"]

    def test_adjacent_stopwords_split(self, spark):
        # "of the" between phrases: the two-pass replace must sever
        # both — "cat" and "house" end up separate 1-word phrases
        from bigdata_tag_system_spark.operators.text import (
            rake_keywords,
        )

        docs = spark.createDataFrame(
            [(1, "cat of the house")], "doc_id long, text string")
        phrases = {r["phrase"] for r in
                   rake_keywords(docs, top_k=10).collect()}
        assert phrases == {"cat", "house"}


class TestCumulativeDistinctCount:
    def test_matches_prefix_set_semantics(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            cumulative_distinct_count,
        )

        rows = [(1, 1, 10, "a"), (2, 1, 20, "b"), (3, 1, 30, "a"),
                (4, 1, 40, "c"), (5, 2, 10, "x"), (6, 2, 20, "x")]
        df = spark.createDataFrame(
            rows, "id long, u long, o long, v string")
        out = cumulative_distinct_count(
            df, "v", "o", "id", part_col="u").collect()
        got = {r["id"]: r["cum_distinct"] for r in out}
        assert got == {1: 1, 2: 2, 3: 2, 4: 3, 5: 1, 6: 1}

    def test_tie_on_order_resolved_by_id(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            cumulative_distinct_count,
        )

        # two rows at the same order value: the lower id "sees" the
        # new value first — a pure function of the inputs
        df = spark.createDataFrame(
            [(2, 10, "a"), (1, 10, "b")], "id long, o long, v string")
        for _ in range(2):
            got = {r["id"]: r["cum_distinct"]
                   for r in cumulative_distinct_count(
                       df.repartition(4), "v", "o", "id").collect()}
            assert got == {1: 1, 2: 2}


class TestQuantileNormalize:
    def test_ranks_total_order_and_bounds(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            quantile_normalize,
        )

        df = spark.createDataFrame(
            [(1, "a", 5.0), (2, "a", 5.0), (3, "a", 1.0),
             (4, "b", 9.0)],
            "id long, g string, v double")
        out = quantile_normalize(df, "v", "id", group_col="g").collect()
        by_id = {r["id"]: r for r in out}
        # tie at v=5.0 resolves by id: total order
        assert by_id[3]["q_uniform_rank"] == 1
        assert by_id[1]["q_uniform_rank"] == 2
        assert by_id[2]["q_uniform_rank"] == 3
        assert by_id[1]["q_uniform"] == 2 / 4
        assert by_id[4]["q_uniform"] == 1 / 2  # singleton group
        assert all(0 < r["q_uniform"] < 1 for r in out)


class TestWrapWidening:
    def test_cms_join_size_survives_int64_product_boundary(self, spark):
        # counters of ~4e9 each: the inner product 1.6e19 exceeds
        # int64 max (9.22e18) — the decimal(38,0) widening must carry
        # the exact value where the old long math would wrap negative
        from decimal import Decimal

        from bigdata_tag_system_spark.operators.sketches import (
            cms_join_size,
        )

        big = 4_000_000_000
        a = spark.createDataFrame(
            [(0, 0, big)], "row_i int, bucket int, cnt long")
        b = spark.createDataFrame(
            [(0, 0, big)], "row_i int, bucket int, cnt long")
        est = cms_join_size(a, b, depth=1).collect()[0]["est_join_size"]
        assert est == Decimal(big) * Decimal(big)
        assert est > 2 ** 63 - 1

    def test_mann_whitney_u2_is_decimal(self, spark, sf_dir):
        import __spark_entry__ as e

        out = e._build_queries()["stats_mann_whitney"](spark, sf_dir)
        assert out.schema["u2"].dataType.simpleString() == "decimal(38,0)"


class TestAsofBackwardTieRule:
    def test_duplicate_right_ts_picks_greatest_value_struct(self, spark):
        # two right rows at the IDENTICAL (key, ts): the greatest value
        # struct must win — a pure function of the inputs, not of
        # partition delivery order (r10 sweep: the backward join gets
        # the r9 asof-nearest tie rule)
        from bigdata_tag_system_spark.operators.timeseries import (
            asof_join,
        )

        left = spark.createDataFrame(
            [(1, 100)], "user_id int, ts long")
        right = spark.createDataFrame(
            [(1, 50, 7.0), (1, 50, 9.0), (1, 50, 3.0)],
            "user_id int, ts long, value double")
        for _ in range(3):  # repartition shuffles delivery order
            out = asof_join(
                left, right.repartition(5), value_cols=["value"])
            assert out.collect()[0]["value_asof"] == 9.0


class TestNativeIdTypes:
    def test_coverage_select_string_ids(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            coverage_select,
        )

        docs = spark.createDataFrame(
            [("d-a", "one two three four five six"),
             ("d-b", "one two three seven eight nine"),
             ("d-c", "ten eleven twelve thirteen fourteen fifteen")],
            "doc_id string, text string")
        out = coverage_select(docs, k=2, pool=3)
        rows = out.collect()
        assert out.schema["doc_id"].dataType.simpleString() == "string"
        assert len(rows) == 2
        assert all(isinstance(r["doc_id"], str) for r in rows)

    def test_mmr_rerank_string_ids_and_schema(self, spark):
        from bigdata_tag_system_spark.operators.similarity import (
            mmr_rerank,
        )

        df = spark.createDataFrame(
            [("v-1", [1.0, 0.0]), ("v-2", [0.9, 0.1]),
             ("v-3", [0.0, 1.0])],
            "vec_id string, embedding array<double>")
        out = mmr_rerank(df, [1.0, 0.0], k=2, pool=3, lam=0.3)
        rows = out.collect()
        assert out.schema["vec_id"].dataType.simpleString() == "string"
        assert [r["rank"] for r in rows] == [1, 2]
        # relevance wins rank 1; at low λ the redundancy penalty pushes
        # the orthogonal vector to rank 2 over the near-duplicate
        assert rows[0]["vec_id"] == "v-1"
        assert rows[1]["vec_id"] == "v-3"

    def test_mmr_rerank_int_ids_keep_source_width(self, spark):
        from bigdata_tag_system_spark.operators.similarity import (
            mmr_rerank,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id int, embedding array<double>")
        out = mmr_rerank(df, [1.0, 0.0], k=1, pool=2)
        assert out.schema["vec_id"].dataType.simpleString() == "int"
        assert out.collect()[0]["vec_id"] == 1
