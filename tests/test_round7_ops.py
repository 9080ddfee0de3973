"""Round-7 operators: portable HLL registers, join-key skew audit,
concat-then-chunk sequence packing."""
from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from bigdata_tag_system_spark.operators.quality import key_skew_report
from bigdata_tag_system_spark.operators.sampling import pack_concat_chunks
from bigdata_tag_system_spark.operators.sketches import hll_register_sketch


# ---------------------------------------------------------------------------
# hll_register_sketch
# ---------------------------------------------------------------------------

class TestHllRegisterSketch:
    def test_estimate_within_standard_error(self, spark):
        # 5000 distinct keys, m=256 -> sigma ~= 1.04/sqrt(256) = 6.5%;
        # assert within 4 sigma (26%) so the test is deterministic-safe
        df = spark.range(5000).select(F.col("id").alias("k"))
        row = hll_register_sketch(df, "k", b=8).first()
        assert row["exact_distinct"] == 5000
        assert row["m"] == 256
        assert abs(row["est_raw"] - 5000) / 5000 < 0.26

    def test_duplicates_do_not_move_registers(self, spark):
        # HLL is insensitive to multiplicity: 3x-duplicated input must
        # produce the IDENTICAL register vector and estimate
        base = spark.range(800).select(F.col("id").alias("k"))
        dup = base.union(base).union(base)
        r1 = hll_register_sketch(base, "k", b=8).first()
        r3 = hll_register_sketch(dup, "k", b=8).first()
        assert r1["regs_md5"] == r3["regs_md5"]
        assert r1["est_raw"] == r3["est_raw"]
        assert r1["z_int"] == r3["z_int"]

    def test_z_int_accounts_every_register(self, spark):
        # sum over all m registers of 2^(53-M_j): with NO rows, every
        # register is zero and Z = m * 2^53 exactly
        df = spark.range(10).where("id < 0").select(F.col("id").alias("k"))
        row = hll_register_sketch(df, "k", b=8).first()
        assert row["registers_hit"] == 0
        assert row["z_int"] == 256 * (1 << 53)

    def test_union_merge_equals_direct(self, spark):
        # registers are max-mergeable: sketch(A union B) computed
        # directly must equal the sketch over the concatenated input
        # (the merge path a day->month rollup would take)
        a = spark.range(0, 600).select(F.col("id").alias("k"))
        b = spark.range(400, 1000).select(F.col("id").alias("k"))
        direct = hll_register_sketch(a.union(b), "k", b=8).first()
        assert direct["exact_distinct"] == 1000
        # re-run on the same union in a different physical order
        shuffled = a.union(b).repartition(7)
        again = hll_register_sketch(shuffled, "k", b=8).first()
        assert direct["regs_md5"] == again["regs_md5"]
        assert direct["est_raw"] == again["est_raw"]

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame(
            [(1,), (2,), (None,)], "k bigint")
        row = hll_register_sketch(df, "k", b=8).first()
        assert row["exact_distinct"] == 2


# ---------------------------------------------------------------------------
# key_skew_report
# ---------------------------------------------------------------------------

class TestKeySkewReport:
    def test_planted_hot_key(self, spark):
        # 1 key with 900 rows + 100 keys with 1 row each
        hot = spark.range(900).select(F.lit(0).alias("k"))
        cold = spark.range(1, 101).select(F.col("id").alias("k"))
        df = hot.union(cold)
        row = key_skew_report(df, "k", target_rows_per_task=100).first()
        assert row["n_rows"] == 1000
        assert row["n_keys"] == 101
        assert row["max_cnt"] == 900
        assert row["avg_cnt"] == 1000 // 101  # floored mean = 9
        assert row["skew_x100"] == 900 * 100 // 9  # 10000 = 100x
        # top-10 = hot key + 9 singletons
        assert row["topn_share_pct"] == (900 + 9) * 100 // 1000
        assert row["rec_salt"] == 9  # ceil(900/100)

    def test_uniform_keys_no_salt(self, spark):
        df = spark.range(1000).select((F.col("id") % 100).alias("k"))
        row = key_skew_report(df, "k", target_rows_per_task=1000).first()
        assert row["max_cnt"] == 10
        assert row["skew_x100"] == 100  # max == mean
        assert row["rec_salt"] == 1

    def test_nulls_excluded(self, spark):
        df = spark.createDataFrame([(1,), (1,), (None,)], "k bigint")
        row = key_skew_report(df, "k").first()
        assert row["n_rows"] == 2 and row["n_keys"] == 1


# ---------------------------------------------------------------------------
# pack_concat_chunks
# ---------------------------------------------------------------------------

def _docs(spark, n=200, tok=lambda i: 10 + (i % 90)):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr("10 + id % 90").alias("n_tokens"))


class TestPackConcatChunks:
    def test_conservation_and_bins(self, spark):
        out = pack_concat_chunks(
            _docs(spark), "n_tokens", budget=128, n_shards=4).collect()
        assert len(out) == 4  # every shard occupied at n=200
        total_docs = sum(r["docs"] for r in out)
        total_tokens = sum(r["tokens"] for r in out)
        assert total_docs == 200
        assert total_tokens == sum(10 + i % 90 for i in range(200))
        for r in out:
            # ceil division and waste arithmetic agree
            assert r["n_bins"] == (r["tokens"] + 127) // 128
            assert r["tail_waste"] == r["n_bins"] * 128 - r["tokens"]
            assert r["fill_pct"] == r["tokens"] * 100 // (r["n_bins"] * 128)
            # a doc can straddle at most every boundary once: straddled
            # docs <= n_bins - 1
            assert 0 <= r["straddled"] <= r["n_bins"] - 1 + 1

    def test_deterministic_across_partitionings(self, spark):
        a = pack_concat_chunks(
            _docs(spark), "n_tokens", budget=100, n_shards=8).collect()
        b = pack_concat_chunks(
            _docs(spark).repartition(13), "n_tokens",
            budget=100, n_shards=8).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_zero_token_docs_excluded(self, spark):
        df = spark.createDataFrame(
            [(1, 50), (2, 0), (3, None), (4, 60)],
            "doc_id bigint, n_tokens bigint")
        out = pack_concat_chunks(df, "n_tokens", budget=64, n_shards=1)
        row = out.first()
        assert row["docs"] == 2 and row["tokens"] == 110

    def test_straddle_identification(self, spark):
        # single shard, known order: force doc order by using one key
        # whose knuth hash ordering we can read back from the layout
        df = spark.createDataFrame(
            [(i, 60) for i in range(8)], "doc_id bigint, n_tokens bigint")
        out = pack_concat_chunks(df, "n_tokens", budget=100, n_shards=1)
        row = out.first()
        # stream = 8 docs x 60 tokens = 480 tokens, bins of 100:
        # boundaries at 100..400 -> docs spanning them straddle.
        # positions: [0,60),[60,120),... every doc whose span crosses a
        # multiple of 100: spans starting at 60,180,300,360? compute:
        spans = [(p * 60, p * 60 + 60) for p in range(8)]
        expect = sum(
            1 for s, e in spans if (s // 100) != ((e - 1) // 100))
        assert row["straddled"] == expect
        assert row["n_bins"] == 5


# ---------------------------------------------------------------------------
# session_window_aggregates (batch semantics on a planted fixture;
# the streaming replay is covered by stream_session_native_parity)
# ---------------------------------------------------------------------------

class TestSessionWindowAggregates:
    def test_planted_sessions(self, spark):
        from bigdata_tag_system_spark.streaming.rule_stream import (
            session_window_aggregates,
        )

        rows = [
            # user 1: two events 30 min apart -> one session; an event
            # exactly 60 min after the previous MERGES (gap boundary is
            # inclusive — this pins the semantics the oracle replays);
            # an event 60 min + 1 s later opens a NEW session
            (1, "2024-01-01 10:00:00", 1.00),
            (1, "2024-01-01 10:30:00", 2.00),
            (1, "2024-01-01 11:30:00", 4.00),
            (1, "2024-01-01 12:30:01", 8.00),
            # user 2: single event
            (2, "2024-01-01 09:00:00", 0.50),
        ]
        df = spark.createDataFrame(
            rows, "user_id bigint, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {(r["user_id"], r["session_start_ms"]): r
               for r in session_window_aggregates(df).collect()}
        assert len(out) == 3
        import datetime as dt

        def ms(s):
            return int(dt.datetime.fromisoformat(s + "+00:00")
                       .timestamp() * 1000)

        s1 = out[(1, ms("2024-01-01 10:00:00"))]
        assert s1["event_count"] == 3 and s1["value_cents"] == 700
        # session end = last event + gap
        assert s1["session_end_ms"] == ms("2024-01-01 12:30:00")
        s2 = out[(1, ms("2024-01-01 12:30:01"))]
        assert s2["event_count"] == 1 and s2["value_cents"] == 800
        s3 = out[(2, ms("2024-01-01 09:00:00"))]
        assert s3["event_count"] == 1 and s3["value_cents"] == 50


# ---------------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------------

class TestLabelPropagation:
    def test_two_triangles_with_bridge(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            label_propagation,
        )

        # two triangles joined by one bridge edge; hand-simulated
        # 3 synchronous rounds (min-label ties) settle to communities
        # {1,2,3}->1 and {4,5,6}->3
        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
            "src bigint, dst bigint")
        got = {r["node"]: r["label"]
               for r in label_propagation(edges, rounds=3).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 3, 5: 3, 6: 3}

    def test_self_loops_and_duplicates_ignored(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            label_propagation,
        )

        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 2), (1, 1)], "src bigint, dst bigint")
        got = {r["node"]: r["label"]
               for r in label_propagation(edges, rounds=2).collect()}
        # single undirected edge: each adopts the other's label each
        # round; after 2 rounds both are back to their own
        assert got == {1: 1, 2: 2}


# ---------------------------------------------------------------------------
# hashed_features
# ---------------------------------------------------------------------------

class TestHashedFeatures:
    def test_hash_and_sign_match_reference_md5(self, spark):
        import hashlib

        from bigdata_tag_system_spark.operators.features import (
            hashed_features,
        )

        df = spark.createDataFrame(
            [(7, "BUILDING")], "user_id bigint, seg string")
        row = hashed_features(df, ["seg"], dims=64).first()
        h = int(hashlib.md5(b"seg=BUILDING").hexdigest()[:15], 16)
        assert row["id"] == 7
        assert row["bucket"] == h % 64
        assert row["weight"] == (1 if (h // 64) % 2 == 0 else -1)

    def test_nulls_contribute_nothing(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            hashed_features,
        )

        df = spark.createDataFrame(
            [(1, None, "x"), (2, "a", None)],
            "user_id bigint, c1 string, c2 string")
        out = hashed_features(df, ["c1", "c2"], dims=16).collect()
        assert len(out) == 2  # one feature per row, NULLs dropped

    def test_repeated_values_accumulate(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            hashed_features,
        )

        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "a")], "user_id bigint, c string")
        row = hashed_features(df, ["c"], dims=16).first()
        assert abs(row["weight"]) == 3  # counts, not presence


# ---------------------------------------------------------------------------
# temperature_allocation
# ---------------------------------------------------------------------------

class TestTemperatureAllocation:
    def test_sums_to_budget_and_flattens(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            temperature_allocation,
        )

        # 10000 'big' rows vs 100 'small': alpha=0.5 weights 100:10,
        # so small gets ~10/110 of the budget (vs ~1% proportional)
        df = spark.range(10100).select(
            F.when(F.col("id") < 10000, "big").otherwise("small")
            .alias("src"))
        out = {r["grp"]: r for r in temperature_allocation(
            df, "src", budget=1000, alpha=0.5).collect()}
        assert out["big"]["alloc"] + out["small"]["alloc"] == 1000
        # sqrt flattening: small's share ~91, far above proportional ~10
        assert 85 <= out["small"]["alloc"] <= 95
        assert out["big"]["n_docs"] == 10000

    def test_alpha_one_quarter_flattens_more(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            temperature_allocation,
        )

        df = spark.range(10100).select(
            F.when(F.col("id") < 10000, "big").otherwise("small")
            .alias("src"))
        half = {r["grp"]: r["alloc"] for r in temperature_allocation(
            df, "src", budget=1000, alpha=0.5).collect()}
        quarter = {r["grp"]: r["alloc"] for r in temperature_allocation(
            df, "src", budget=1000, alpha=0.25).collect()}
        assert quarter["small"] > half["small"]
        assert sum(quarter.values()) == 1000

    def test_unsupported_alpha_raises(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            temperature_allocation,
        )

        df = spark.range(10).select(F.lit("a").alias("src"))
        with pytest.raises(ValueError):
            temperature_allocation(df, "src", budget=10, alpha=0.7)

    def test_largest_remainder_exactness(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            temperature_allocation,
        )

        # three equal groups, budget 10: 10/3 each -> 3/3/3 + 1 to the
        # largest remainder (all equal -> smallest key wins the extra)
        df = spark.range(30).select(
            F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
            .alias("src"))
        out = {r["grp"]: r["alloc"] for r in temperature_allocation(
            df, "src", budget=10, alpha=0.5).collect()}
        assert sum(out.values()) == 10
        assert out == {"s0": 4, "s1": 3, "s2": 3}


# ---------------------------------------------------------------------------
# split_leakage_report
# ---------------------------------------------------------------------------

class TestSplitLeakageReport:
    def test_planted_cross_split_pairs(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            split_leakage_report,
        )

        pairs = spark.createDataFrame(
            [(1, 2), (3, 4), (5, 6)], "id_a bigint, id_b bigint")
        splits = spark.createDataFrame(
            [(1, "train"), (2, "test"), (3, "train"), (4, "train"),
             (5, "val"), (6, "test")], "doc_id bigint, split string")
        out = {(r["split_lo"], r["split_hi"]): r
               for r in split_leakage_report(pairs, splits).collect()}
        assert out[("test", "train")]["cross_split"] is True
        assert out[("test", "train")]["n_pairs"] == 1
        assert out[("test", "train")]["pair_id_sum"] == 3
        assert out[("train", "train")]["cross_split"] is False
        assert out[("test", "val")]["n_pairs"] == 1
        assert len(out) == 3

    def test_pairs_missing_split_drop(self, spark):
        from bigdata_tag_system_spark.operators.dedup import (
            split_leakage_report,
        )

        # inner joins: a pair whose member has no split row vanishes
        # (the audit only speaks about assigned docs)
        pairs = spark.createDataFrame(
            [(1, 99)], "id_a bigint, id_b bigint")
        splits = spark.createDataFrame(
            [(1, "train")], "doc_id bigint, split string")
        assert split_leakage_report(pairs, splits).count() == 0


# ---------------------------------------------------------------------------
# cms_join_size
# ---------------------------------------------------------------------------

class TestCmsJoinSize:
    def test_one_sided_and_tight_when_sparse(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            cms_build, cms_join_size,
        )

        # 50 keys on each side, skewed counts; width=256 >> keys so
        # collisions are rare and the estimate should be close
        a = spark.range(500).select((F.col("id") % 50).alias("k"))
        b = spark.range(200).select((F.col("id") % 40).alias("k"))
        est = cms_join_size(
            cms_build(a, "k", width=256, depth=3),
            cms_build(b, "k", width=256, depth=3), depth=3
        ).first()["est_join_size"]
        na = {r["k"]: r["cnt"] for r in
              a.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        nb = {r["k"]: r["cnt"] for r in
              b.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
        exact = sum(na[k] * nb[k] for k in na if k in nb)
        assert est >= exact          # CMS inner product never undercounts
        assert est <= exact * 2      # and is tight at this sparsity

    def test_disjoint_keys_can_reach_zero(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            cms_build, cms_join_size,
        )

        # one key per side, different values: if ANY of the 3 hash rows
        # separates them the min is 0; equal est>0 would require all 3
        # rows to collide (prob (1/256)^3)
        a = spark.range(10).select(F.lit(1).alias("k"))
        b = spark.range(10).select(F.lit(2).alias("k"))
        est = cms_join_size(
            cms_build(a, "k", width=256, depth=3),
            cms_build(b, "k", width=256, depth=3), depth=3
        ).first()["est_join_size"]
        assert est == 0

    def test_empty_side_gives_zero(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            cms_build, cms_join_size,
        )

        a = spark.range(10).select(F.lit(1).alias("k"))
        b = spark.range(0).select(F.col("id").alias("k"))
        est = cms_join_size(
            cms_build(a, "k"), cms_build(b, "k")).first()
        assert est["est_join_size"] == 0


# ---------------------------------------------------------------------------
# ohlc_bars
# ---------------------------------------------------------------------------

class TestOhlcBars:
    def test_planted_bar_with_ts_tie(self, spark):
        from bigdata_tag_system_spark.operators.timeseries import (
            ohlc_bars,
        )

        rows = [
            # one user, one hour; two events share the SAME ts — the
            # seq column (event_id) must break the tie for open/close
            (1, 10, "2024-01-01 10:00:05", 5.0),
            (1, 11, "2024-01-01 10:00:05", 7.0),
            (1, 12, "2024-01-01 10:59:59", 2.0),
            (1, 13, "2024-01-01 11:00:00", 9.0),  # next bar
        ]
        df = spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        out = {r["bucket_id"]: r for r in ohlc_bars(
            df, bucket="1 hour", seq_col="event_id").collect()}
        assert len(out) == 2
        bar = [v for v in out.values() if v["volume"] == 3][0]
        assert bar["open"] == 5.0    # event_id 10 wins the ts tie
        assert bar["close"] == 2.0
        assert bar["high"] == 7.0 and bar["low"] == 2.0
        nxt = [v for v in out.values() if v["volume"] == 1][0]
        assert nxt["open"] == nxt["close"] == 9.0

    def test_bars_merge_across_partitionings(self, spark):
        from bigdata_tag_system_spark.operators.timeseries import (
            ohlc_bars,
        )

        rows = [(i % 3, i, f"2024-01-01 0{i % 9}:10:00", float(i))
                for i in range(27)]
        df = spark.createDataFrame(
            rows, "user_id bigint, event_id bigint, ts string, value double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        a = sorted(map(tuple, ohlc_bars(
            df, seq_col="event_id").collect()))
        b = sorted(map(tuple, ohlc_bars(
            df.repartition(7), seq_col="event_id").collect()))
        assert a == b


class TestHllGrouped:
    def test_grouped_matches_per_group_global(self, spark):
        # each group's row must equal the GLOBAL sketch of that
        # group's rows alone — grouping changes bookkeeping, not math
        df = spark.range(3000).select(
            F.when(F.col("id") % 3 == 0, "a").otherwise("b").alias("g"),
            (F.col("id") % 700).alias("k"))
        grouped = {r["g"]: r for r in hll_register_sketch(
            df, "k", b=8, group_col="g").collect()}
        for gname in ["a", "b"]:
            solo = hll_register_sketch(
                df.where(F.col("g") == gname), "k", b=8).first()
            assert grouped[gname]["regs_md5"] == solo["regs_md5"]
            assert grouped[gname]["est_raw"] == solo["est_raw"]
            assert (grouped[gname]["exact_distinct"]
                    == solo["exact_distinct"])

    def test_register_max_merge_across_groups(self, spark):
        # merging two groups' register vectors by register-wise max
        # must reproduce the global sketch over their union — the
        # rollup contract
        df = spark.range(2000).select(
            F.when(F.col("id") < 1000, "d1").otherwise("d2").alias("g"),
            F.col("id").alias("k"))
        # recompute registers directly to merge them
        from bigdata_tag_system_spark.functions.text import (
            portable_hash60,
        )

        h = portable_hash60(F.col("k").cast("string"))
        regs = (df.select("g", F.pmod(h, F.lit(256)).alias("reg"),
                          h.alias("_h"))
                .withColumn(
                    "rho",
                    F.when(F.expr("_h DIV 256") == 0, F.lit(53))
                    .otherwise(F.lit(53)
                               - F.length(F.bin(F.expr("_h DIV 256")))))
                .groupBy("g", "reg").agg(F.max("rho").alias("mr")))
        merged = regs.groupBy("reg").agg(F.max("mr").alias("mr"))
        merged_md5 = merged.agg(F.md5(F.array_join(F.array_sort(
            F.collect_list(F.concat_ws(
                ":", F.lpad(F.col("reg").cast("string"), 3, "0"),
                F.col("mr").cast("string")))), ","))).first()[0]
        global_row = hll_register_sketch(df, "k", b=8).first()
        assert merged_md5 == global_row["regs_md5"]


class TestEdgeCommonNeighbors:
    def test_two_triangles_with_bridge(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            edge_common_neighbors,
        )

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (4, 5), (4, 6), (5, 6), (3, 4)],
            "src bigint, dst bigint")
        out = {(r["id_a"], r["id_b"]): r
               for r in edge_common_neighbors(edges, top_n=10).collect()}
        # every triangle edge has exactly 1 common neighbor; the
        # bridge (3,4) has none and is absent from the census
        assert len(out) == 6 and (3, 4) not in out
        assert out[(1, 2)]["common_neighbors"] == 1
        # deg(1)=2, deg(2)=2: j = 10000*1/(2+2-1) = 3333
        assert out[(1, 2)]["jaccard_bp"] == 3333
        # deg(2)=2, deg(3)=3: j = 10000*1/(2+3-1) = 2500
        assert out[(2, 3)]["jaccard_bp"] == 2500

    def test_k4_every_edge_has_two(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            edge_common_neighbors,
        )

        k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
        edges = spark.createDataFrame(k4, "src bigint, dst bigint")
        rows = edge_common_neighbors(edges, top_n=10).collect()
        assert len(rows) == 6
        assert all(r["common_neighbors"] == 2 for r in rows)
        # deg 3 everywhere: j = 20000 // (3+3-2) = 5000
        assert all(r["jaccard_bp"] == 5000 for r in rows)


class TestNullProfile:
    def test_planted_nulls_and_cardinality(self, spark):
        from bigdata_tag_system_spark.operators.quality import (
            null_profile,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a"), (None, "b")],
            "x bigint, y string")
        out = {r["col_name"]: r for r in null_profile(df).collect()}
        assert out["x"]["n_rows"] == 4
        assert out["x"]["nulls"] == 1
        assert out["x"]["null_bp"] == 2500
        assert out["x"]["n_distinct"] == 3
        assert out["y"]["nulls"] == 1 and out["y"]["n_distinct"] == 2

    def test_empty_table(self, spark):
        from bigdata_tag_system_spark.operators.quality import (
            null_profile,
        )

        df = spark.range(0).select(F.col("id").alias("x"))
        row = null_profile(df).first()
        assert row["n_rows"] == 0 and row["null_bp"] == 0
