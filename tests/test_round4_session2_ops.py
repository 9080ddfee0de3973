"""Invariants for the second round-4 operator batch: fuzzy edit-distance
dedup, bitmap exact-distinct, fixed-point histogram, MAD outliers,
gaps-and-islands, trailing RANGE windows, mixture sampling, Z-order
layout, and per-group KL. These back the oracle rows
(`dedup_fuzzy_edit` … `layout_zorder_cells`); the properties here cover
what a value-hash compare cannot (blocking completeness, error paths,
plan-independence, reconstruction)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_tag_system_spark.operators.dedup import fuzzy_edit_pairs
from bigdata_tag_system_spark.operators.features import (
    collapse_runs,
    rolling_time_features,
)
from bigdata_tag_system_spark.operators.layout import (
    cluster_zorder,
    zorder_value,
)
from bigdata_tag_system_spark.operators.sampling import mixture_sample
from bigdata_tag_system_spark.operators.sketches import (
    bitmap_distinct_count,
    histogram_equi_width,
    mad_outlier_check,
)
from bigdata_tag_system_spark.operators.text import source_token_kl


class TestFuzzyEditPairs:
    def test_matches_brute_force_across_bands(self, spark):
        # texts engineered so some true pairs straddle a band boundary
        # with the LOWER id in the HIGHER band (the orientation a naive
        # id_a < id_b band join loses)
        rows = [
            (1, "a" * 12),        # len 12, band floor(12/4)=3
            (2, "a" * 11),        # len 11, band 2 — pair (1,2) dist 1
            (3, "b" * 8),         # band 2
            (4, "b" * 8 + "c"),   # band 2 — pair (3,4) dist 1
            (5, "zzzzzz"),        # band 1, no partner
            (6, None),            # null text must not join
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in fuzzy_edit_pairs(df, max_dist=3).collect()
        }
        import itertools

        def lev(a, b):
            import numpy as np

            d = np.arange(len(b) + 1)
            for i, ca in enumerate(a, 1):
                prev, d[0] = d[0], i
                for j, cb in enumerate(b, 1):
                    prev, d[j] = d[j], min(
                        d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
            return int(d[len(b)])

        want = set()
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            if ta is None or tb is None:
                continue
            dist = lev(ta, tb)
            if dist <= 3:
                want.add((min(ia, ib), max(ia, ib), dist))
        assert got == want
        assert (1, 2, 1) in got  # the cross-band pair specifically

    def test_zero_distance_and_validation(self, spark):
        df = spark.createDataFrame(
            [(1, "same"), (2, "same")], "doc_id long, text string")
        [r] = fuzzy_edit_pairs(df, max_dist=0).collect()
        assert (r.id_a, r.id_b, r.dist) == (1, 2, 0)
        with pytest.raises(ValueError, match="max_dist"):
            fuzzy_edit_pairs(df, max_dist=-1)


class TestBitmapDistinct:
    def test_equals_count_distinct(self, spark):
        df = spark.range(0, 5000).select(
            (F.col("id") % 137).alias("k"))
        [r] = bitmap_distinct_count(df, "k").collect()
        assert r.distinct_cnt == 137

    def test_rejects_non_integral(self, spark):
        df = spark.createDataFrame([("x",)], "s string")
        with pytest.raises(ValueError, match="integral"):
            bitmap_distinct_count(df, "s")


class TestHistogram:
    def test_partition_of_rows(self, spark):
        df = spark.range(0, 1000).select(
            (F.col("id") / 7.0).alias("v"))
        out = histogram_equi_width(df, "v", buckets=8).collect()
        assert sum(r.cnt for r in out) == 1000
        assert {r.bucket for r in out} <= set(range(8))
        by_bucket = sorted(out, key=lambda r: r.bucket)
        for a, b in zip(by_bucket, by_bucket[1:]):
            assert a.hi <= b.lo or abs(a.hi - b.lo) < 1e-9
        assert min(r.lo for r in out) <= 0.0
        with pytest.raises(ValueError, match="buckets"):
            histogram_equi_width(df, "v", buckets=0)


class TestMadOutliers:
    def test_flags_planted_outlier(self, spark):
        vals = [(float(v),) for v in [10, 11, 12, 13, 14, 1000]]
        df = spark.createDataFrame(vals, "value double")
        [r] = mad_outlier_check(df, "value").collect()
        assert r.total == 6
        assert r.n_outliers == 1  # only the 1000
        assert r.fence > 0

    def test_grouped_shape(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("b", 3.0)], "g string, value double")
        out = mad_outlier_check(df, "value", group_col="g").collect()
        assert {r.g for r in out} == {"a", "b"}
        assert sum(r.total for r in out) == 3


class TestCollapseRuns:
    def test_known_runs(self, spark):
        rows = [
            (1, "x", 1, 101), (1, "x", 2, 102), (1, "y", 3, 103),
            (1, "x", 4, 104),
            (2, "y", 1, 201), (2, "y", 2, 202), (2, "y", 3, 203),
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts long, event_id long")
        out = collapse_runs(df).collect()
        runs = {(r.user_id, r.event_type, r.run_start, r.run_len)
                for r in out}
        assert runs == {
            (1, "x", 1, 2), (1, "y", 3, 1), (1, "x", 4, 1),
            (2, "y", 1, 3),
        }
        assert sum(r.run_len for r in out) == len(rows)

    def test_run_count_invariant_on_real_data(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(ev.dtypes)["ts"] == "bigint":
            ev = ev.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
        out = collapse_runs(ev)
        total = ev.count()
        agg = out.agg(
            F.sum("run_len").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        assert agg.s == total      # runs partition the events
        assert agg.n <= total


class TestRollingWindow:
    def test_trailing_counts_with_same_second_ties(self, spark):
        rows = [
            (1, "2024-01-01 00:00:00", 1, 1.0),
            (1, "2024-01-01 00:00:00", 2, 2.0),   # same-second peer
            (1, "2024-01-03 00:00:00", 3, 4.0),
            (1, "2024-01-20 00:00:00", 4, 8.0),   # outside 7d of 1-3
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts string, event_id long, value double"
        ).withColumn("ts", F.to_timestamp("ts"))
        out = {r.event_id: (r.trailing_cnt, r.trailing_sum)
               for r in rolling_time_features(
                   df, window_seconds=7 * 86400).collect()}
        # RANGE peers: both same-second rows see both
        assert out[1] == (2, 3.0)
        assert out[2] == (2, 3.0)
        assert out[3] == (3, 7.0)
        assert out[4] == (1, 8.0)


class TestMixtureSample:
    def test_allocation_and_determinism(self, spark):
        rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, src string")
        kept = mixture_sample(df, "src", "id", total=100, portable=True)
        counts = {r.src: r.c for r in
                  kept.groupBy("src").agg(
                      F.count(F.lit(1)).alias("c")).collect()}
        # floor(sqrt(900))=30, floor(sqrt(100))=10 → 100*30/40=75, 25
        assert counts == {"big": 75, "small": 25}
        # plan-independence: same kept ids after a repartition
        a = {r.id for r in kept.collect()}
        b = {r.id for r in mixture_sample(
            df.repartition(7), "src", "id",
            total=100, portable=True).collect()}
        assert a == b

    def test_validation(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, src string")
        with pytest.raises(ValueError, match="total"):
            mixture_sample(df, "src", "id", total=0)
        df2 = spark.createDataFrame([("k", "a")], "id string, src string")
        with pytest.raises(ValueError, match="integral"):
            mixture_sample(df2, "src", "id", total=1, portable=True)


class TestZorder:
    def test_known_interleave(self, spark):
        # x=0b01, y=0b10 → bits: x0=1→pos0, x1=0→pos2, y0=0→pos1,
        # y1=1→pos3 → z = 0b1001 = 9
        df = spark.createDataFrame([(1, 2)], "x long, y long")
        [r] = df.select(zorder_value(["x", "y"], bits=2).alias("z")).collect()
        assert r.z == 9

    def test_validation(self, spark):
        with pytest.raises(ValueError, match=">= 2"):
            zorder_value(["x"], bits=4)
        with pytest.raises(ValueError, match="int64"):
            zorder_value(["x", "y", "z"], bits=21)

    def test_cluster_locality(self, spark):
        # after range-clustering by z, each partition's z-span is
        # disjoint — the property that makes min/max stats prune
        df = spark.range(0, 4096).select(
            (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
        cl = cluster_zorder(df, ["x", "y"], bits=6)
        spans = (
            cl.withColumn("p", F.spark_partition_id())
            .groupBy("p").agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
            .orderBy("lo").collect()
        )
        for a, b in zip(spans, spans[1:]):
            assert a.hi <= b.lo


class TestSourceKl:
    def test_identical_groups_zero_divergence(self, spark):
        rows = [(i, "g%d" % (i % 2), "same tokens here") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        out = source_token_kl(df, group_col="source").collect()
        assert all(abs(r.kl_nats) < 1e-12 for r in out)

    def test_nonnegative_and_counts(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = source_token_kl(docs, group_col="lang").collect()
        assert all(r.kl_nats >= -1e-12 for r in out)
        assert sum(r.n_tokens for r in out) > 0


class TestScd2:
    def test_flapping_attribute_three_periods(self, spark):
        rows = [
            (1, "A", 1), (1, "A", 2), (1, "B", 3), (1, "A", 4),
            (2, "X", 1),
        ]
        df = spark.createDataFrame(
            rows, "k long, attr string, seq long")
        from bigdata_tag_system_spark.operators.features import (
            scd2_from_events,
        )

        out = sorted(
            scd2_from_events(
                df, key_col="k", attr_col="attr", order_cols=("seq",)
            ).collect(),
            key=lambda r: (r.k, r.valid_from))
        periods = [(r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
                   for r in out]
        assert periods == [
            (1, "A", 1, 3, False),
            (1, "B", 3, 4, False),
            (1, "A", 4, None, True),   # A→B→A = three periods
            (2, "X", 1, None, True),
        ]


class TestEpochOversample:
    def test_copies_and_fractional_remainder(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            epoch_oversample,
        )

        rows = [(i, "hq" if i < 10 else "lq") for i in range(110)]
        df = spark.createDataFrame(rows, "id long, src string")
        out = epoch_oversample(
            df, "src", "id", ratios={"hq": 2.5, "lq": 0.25},
            portable=True)
        counts = {r.src: r.n for r in out.groupBy("src").agg(
            F.count(F.lit(1)).alias("n")).collect()}
        # hq: floor(10*2.5)=25 rows; lq: floor(100*0.25)=25 rows
        assert counts == {"hq": 25, "lq": 25}
        # every hq id appears 2 or 3 times; copy_idx dense from 0
        per_id = {r.id: r.n for r in out.where("src = 'hq'")
                  .groupBy("id").agg(F.count(F.lit(1)).alias("n"))
                  .collect()}
        assert set(per_id.values()) == {2, 3}
        assert sum(per_id.values()) == 25
        mx = out.where("src = 'hq'").agg(
            F.max("copy_idx")).collect()[0][0]
        assert mx == 2

    def test_determinism_and_validation(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            epoch_oversample,
        )

        rows = [(i, "a") for i in range(50)]
        df = spark.createDataFrame(rows, "id long, src string")
        a = sorted((r.id, r.copy_idx) for r in epoch_oversample(
            df, "src", "id", ratios={"a": 0.4}, portable=True).collect())
        b = sorted((r.id, r.copy_idx) for r in epoch_oversample(
            df.repartition(5), "src", "id", ratios={"a": 0.4},
            portable=True).collect())
        assert a == b and len(a) == 20
        with pytest.raises(ValueError, match=">= 0"):
            epoch_oversample(df, "src", "id", ratios={"a": -1.0})


class TestQuality:
    def test_expectations_catch_planted_violations(self, spark):
        from bigdata_tag_system_spark.operators.quality import (
            expectation_report,
        )

        rows = [(1, "x", 5.0), (2, "x", -1.0), (2, "y", 3.0),
                (None, "z", 4.0)]
        df = spark.createDataFrame(rows, "id long, s string, v double")
        out = {r.check: (r.violations, r.ok)
               for r in expectation_report(
                   df, not_null=["id"], unique=["id"],
                   accepted_values={"s": ["x", "y"]},
                   ranges={"v": (0.0, 10.0)}).collect()}
        assert out["not_null:id"] == (1, False)
        assert out["unique:id"] == (1, False)      # id=2 twice
        assert out["accepted:s"] == (1, False)     # 'z'
        assert out["range:v"] == (1, False)        # -1.0
        with pytest.raises(ValueError, match="at least one"):
            expectation_report(df)

    def test_referential_orphans(self, spark):
        from bigdata_tag_system_spark.operators.quality import (
            referential_audit,
        )

        fact = spark.createDataFrame(
            [(1,), (2,), (99,), (None,)], "fk long")
        dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
        [r] = referential_audit([("f", fact, "fk", dim, "pk")]).collect()
        assert (r.relation, r.orphans, r.ok) == ("f", 1, False)
        with pytest.raises(ValueError, match="at least one"):
            referential_audit([])


class TestBigramLm:
    def test_hand_computed_probabilities(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            bigram_lm_scores,
        )
        import math

        # corpus bigrams: d1: (a b), (b a); d2: (a b), (b b)
        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "a b b"), (3, "x")],
            "doc_id long, text string")
        out = {r.doc_id: (r.n_bigrams, r.avg_logp)
               for r in bigram_lm_scores(docs, smoothing=0.5).collect()}
        assert 3 not in out            # single-token doc excluded
        # counts: c2(a b)=2, c2(b a)=1, c2(b b)=1; c1(a)=2, c1(b)=2;
        # V = followers {a, b} = 2
        p_ab = (2 + 0.5) / (2 + 0.5 * 2)
        p_ba = (1 + 0.5) / (2 + 0.5 * 2)
        p_bb = (1 + 0.5) / (2 + 0.5 * 2)
        want1 = (math.log(p_ab) + math.log(p_ba)) / 2
        want2 = (math.log(p_ab) + math.log(p_bb)) / 2
        assert out[1][0] == 2 and abs(out[1][1] - want1) < 1e-9
        assert out[2][0] == 2 and abs(out[2][1] - want2) < 1e-9

    def test_scores_rank_gibberish_low(self, spark, sf_dir):
        from bigdata_tag_system_spark.operators.text import (
            bigram_lm_scores,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        out = bigram_lm_scores(docs)
        assert out.where("avg_logp >= 0").count() == 0  # log-probs < 0


class TestChiSquare:
    def test_hand_computed_2x2(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            chi_square_independence,
        )

        # 2x2 table: [[10, 20], [30, 40]] -> chi2 = n(ad-bc)^2 /
        # ((a+b)(c+d)(a+c)(b+d)) = 100*(400-600)^2/(30*70*40*60)
        rows = ([("x", "p")] * 10 + [("x", "q")] * 20
                + [("y", "p")] * 30 + [("y", "q")] * 40)
        df = spark.createDataFrame(rows, "a string, b string")
        [r] = chi_square_independence(df, "a", "b").collect()
        want = 100 * (10 * 40 - 20 * 30) ** 2 / (30 * 70 * 40 * 60)
        assert abs(r.chi2 - want) < 1e-9
        assert r.dof == 1 and r.n == 100

    def test_unobserved_cell_contributes_expected(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            chi_square_independence,
        )

        # ("y","q") never observed: its expected count e=2.5 must still
        # enter the statistic via the sparse correction term
        rows = ([("x", "p")] * 5 + [("x", "q")] * 5 + [("y", "p")] * 5)
        df = spark.createDataFrame(rows, "a string, b string")
        [r] = chi_square_independence(df, "a", "b").collect()
        # dense computation: e = [[6.667,3.333],[3.333,1.667]]
        import itertools
        obs = {("x", "p"): 5, ("x", "q"): 5, ("y", "p"): 5,
               ("y", "q"): 0}
        ra = {"x": 10, "y": 5}; rb = {"p": 10, "q": 5}; n = 15
        want = sum((obs[(a, b)] - ra[a] * rb[b] / n) ** 2
                   / (ra[a] * rb[b] / n)
                   for a, b in itertools.product("xy", "pq"))
        assert abs(r.chi2 - want) < 1e-9


class TestIngestion:
    def test_jsonl_corrupt_capture(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.readers import (
            read_jsonl_corpus,
        )

        p = tmp_path / "c.jsonl"
        p.write_text(
            '{"doc_id": 1, "lang": "en"}\n'
            'not json\n'
            '{"doc_id": 2, "lang": "fr"}\n')
        df = read_jsonl_corpus(
            spark, str(p), schema="doc_id bigint, lang string")
        rows = df.collect()
        assert len(rows) == 3           # garbage captured, not dropped
        bad = [r for r in rows if r["_corrupt_record"] is not None]
        assert len(bad) == 1 and bad[0]["_corrupt_record"] == "not json"
        assert {r.doc_id for r in rows if r.doc_id} == {1, 2}

    def test_jsonl_structtype_and_predeclared_corrupt_col(self, spark, tmp_path):
        from pyspark.sql.types import LongType, StringType, StructField, StructType
        from bigdata_tag_system_spark.sources.readers import (
            read_jsonl_corpus,
        )

        p = tmp_path / "c2.jsonl"
        p.write_text('{"doc_id": 1}\nnope\n')

        # StructType schema accepted (was str-only: DDL append crashed)
        st = StructType([StructField("doc_id", LongType())])
        rows = read_jsonl_corpus(spark, str(p), schema=st).collect()
        assert len(rows) == 2
        assert [r["_corrupt_record"] for r in rows if r["_corrupt_record"]] \
            == ["nope"]
        assert len(st.fields) == 1  # caller's schema not mutated

        # schema already declaring the corrupt column: no duplicate
        dup = "doc_id bigint, _corrupt_record string"
        df = read_jsonl_corpus(spark, str(p), schema=dup)
        assert df.columns == ["doc_id", "_corrupt_record"]
        st2 = StructType([StructField("doc_id", LongType()),
                          StructField("_corrupt_record", StringType())])
        assert read_jsonl_corpus(spark, str(p), schema=st2).columns \
            == ["doc_id", "_corrupt_record"]

    def test_attribution_join_custom_columns(self, spark, tmp_path):
        # a stream WITHOUT event_id/value columns plans and runs when the
        # ids are parameterized (previously hardcoded -> analysis error)
        from bigdata_tag_system_spark.streaming.rule_stream import (
            stream_stream_attribution_join,
        )

        rows = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 100),
             (1, "2024-01-01 10:20:00", 200)],
            "uid long, ts string, rec_id long",
        ).withColumn("ts", F.to_timestamp("ts"))
        src = str(tmp_path / "attr_src")
        rows.write.mode("overwrite").parquet(src)
        left = spark.readStream.schema(
            "uid long, ts timestamp, rec_id long").parquet(src) \
            .where("rec_id = 100")
        right = spark.readStream.schema(
            "uid long, ts timestamp, rec_id long").parquet(src) \
            .where("rec_id = 200")
        j = stream_stream_attribution_join(
            left, right, user_col="uid", id_col="rec_id", value_col=None)
        out = []
        q = (j.writeStream.outputMode("append")
             .option("checkpointLocation", str(tmp_path / "attr_ckpt"))
             .foreachBatch(lambda df, bid: out.extend(df.collect()))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert [(r["l_event_id"], r["r_event_id"]) for r in out] \
            == [(100, 200)]
        assert "r_value" not in j.columns

    def test_partitioned_write_dynamic_overwrite(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.writers import (
            write_partitioned_dataset,
        )

        out = str(tmp_path / "ds")
        df1 = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, day string")
        write_partitioned_dataset(df1, out, ["day"])
        # overwrite ONLY day=a — day=b must survive (dynamic mode)
        df2 = spark.createDataFrame([(9, "a")], "id long, day string")
        write_partitioned_dataset(df2, out, ["day"])
        got = {(r.id, r.day)
               for r in spark.read.parquet(out).collect()}
        assert got == {(9, "a"), (2, "b")}

    def test_partition_pruning_in_plan(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.writers import (
            write_partitioned_dataset,
        )
        from pyspark.sql import functions as F

        out = str(tmp_path / "pds")
        df = spark.range(0, 100).select(
            "id", (F.col("id") % 5).cast("string").alias("part"))
        write_partitioned_dataset(df, out, ["part"])
        scan = spark.read.parquet(out).where(F.col("part") == "3")
        plan = scan._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(part" in plan \
            or "PartitionFilters: [" in plan
        assert scan.count() == 20

    def test_compaction_preserves_rows(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.writers import (
            compact_parquet,
        )

        out = str(tmp_path / "frag")
        spark.range(0, 1000).repartition(40).write.parquet(out)
        import glob
        assert len(glob.glob(out + "/*.parquet")) == 40
        n_files = compact_parquet(spark, out, target_file_mb=512)
        assert n_files < 40
        got = sorted(r.id for r in spark.read.parquet(out).collect())
        assert got == list(range(1000))

    def test_clustered_compaction_disjoint_ranges(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from bigdata_tag_system_spark.sources.writers import (
            compact_parquet,
        )

        out = str(tmp_path / "clustered")
        # shuffled key order so round-robin files interleave key ranges;
        # incompressible payload so the data outweighs the 1 MB target
        spark.range(0, 120000).select(
            F.xxhash64("id").alias("salt"), F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("pay"),
        ).orderBy("salt").drop("salt").repartition(32).write.parquet(out)
        # ~tiny target so the clustered rewrite yields multiple files
        n_files = compact_parquet(
            spark, out, target_file_mb=1, cluster_by=["k"])
        files = glob.glob(out + "/*.parquet")
        assert len(files) == n_files and 1 < n_files < 32
        # footer min/max per file must form non-overlapping k ranges
        spans = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            lo = min(md.row_group(i).column(0).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(0).statistics.max
                     for i in range(md.num_row_groups))
            spans.append((lo, hi))
        spans.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(spans, spans[1:]):
            assert hi1 < lo2, spans
        # row identity preserved
        got = sorted(r.k for r in spark.read.parquet(out).collect())
        assert got == list(range(120000))


class TestHllRollup:
    def test_merged_estimate_accuracy(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            mergeable_distinct_rollup,
        )

        # 5000 keys spread over 10 buckets with heavy cross-bucket
        # repetition: union of per-bucket sketches must estimate the
        # GLOBAL cardinality, not the sum of per-bucket ones
        df = spark.range(0, 20000).select(
            (F.col("id") % 5000).alias("k"),
            (F.col("id") % 10).alias("b"))
        [r] = mergeable_distinct_rollup(df, "k", F.col("b")).collect()
        assert r.n_buckets == 10
        assert r.exact_distinct == 5000
        assert r.within_tolerance
        assert abs(r.approx_distinct - 5000) <= 0.05 * 5000


class TestTpchPushdown:
    def test_q6_predicates_reach_scan(self, spark, sf_dir):
        import __spark_entry__ as entry

        df = entry._build_queries()["tpch_q6"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the selective predicates must appear as pushed scan filters
        # (the rendered list truncates, so match its head) and the scan
        # must prune to exactly the four referenced columns
        assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
        assert "IsNotNull(l_quantity)" in plan
        assert ("ReadSchema: struct<l_quantity:double,l_extendedprice:"
                "double,l_discount:double,l_shipdate" in plan)


class TestPagerank:
    def test_hand_computed_two_node_cycle(self, spark):
        from bigdata_tag_system_spark.operators.graph import pagerank

        # a <-> b symmetric cycle: uniform stationary distribution —
        # every iteration maps (0.5, 0.5) to itself exactly
        e = spark.createDataFrame(
            [("a", "b", 1), ("b", "a", 1)], "src string, dst string, n long")
        out = {r.node: r.rank
               for r in pagerank(e, weight="n", iterations=10).collect()}
        assert abs(out["a"] - 0.5) < 1e-12
        assert abs(out["b"] - 0.5) < 1e-12

    def test_sink_accumulates_more_rank(self, spark):
        from bigdata_tag_system_spark.operators.graph import pagerank

        # star into 'hub': hub must outrank the leaves; total mass of
        # non-dangling formulation stays <= 1
        edges = [(f"u{i}", "hub", 1) for i in range(5)]
        e = spark.createDataFrame(edges, "src string, dst string, n long")
        out = {r.node: r.rank for r in pagerank(e, weight="n").collect()}
        assert out["hub"] > max(v for k, v in out.items() if k != "hub")
        with pytest.raises(ValueError, match="iterations"):
            pagerank(e, iterations=0)


class TestTriangleCount:
    def test_hand_built_graph(self, spark):
        from bigdata_tag_system_spark.operators.graph import triangle_count

        # K4 on {1,2,3,4} has 4 triangles; node 9 hangs off node 1
        # (degree-1 pendant, closes nothing); a duplicate and a
        # reversed duplicate edge must not double-count; a self-loop
        # must be dropped
        edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
                 (1, 9), (2, 1), (3, 1), (5, 5)]
        e = spark.createDataFrame(edges, "src long, dst long")
        row = triangle_count(e).collect()[0]
        assert (row["n_nodes"], row["n_edges"], row["n_triangles"]) \
            == (5, 7, 4)

    def test_hub_graph_orientation(self, spark):
        from bigdata_tag_system_spark.operators.graph import triangle_count

        # star hub + one rim edge: exactly the rim triangle; the hub's
        # high degree means orientation points rim->hub, so the hub
        # contributes ZERO wedges — the power-law safety property
        edges = [(0, i) for i in range(1, 30)] + [(1, 2)]
        e = spark.createDataFrame(edges, "src long, dst long")
        row = triangle_count(e).collect()[0]
        assert row["n_triangles"] == 1


class TestResolveHierarchy:
    def test_deep_chain_resolves_in_log_rounds(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            resolve_hierarchy,
        )

        # chain 40 -> 39 -> ... -> 0: pointer doubling must finish
        # within ceil(log2(40))+1 = 7 rounds — max_rounds=7 would raise
        # if the loop were walking one level per round
        e = spark.createDataFrame(
            [(i, i - 1) for i in range(1, 41)], "child long, parent long")
        out = {r["node"]: (r["root"], r["depth"])
               for r in resolve_hierarchy(e, max_rounds=7).collect()}
        assert out[40] == (0, 40)
        assert out[1] == (0, 1)
        assert out[0] == (0, 0)

    def test_forest_keeps_roots_apart(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            resolve_hierarchy,
        )

        e = spark.createDataFrame(
            [(1, 0), (2, 1), (11, 10), (12, 11), (13, 10)],
            "child long, parent long")
        out = {r["node"]: (r["root"], r["depth"])
               for r in resolve_hierarchy(e).collect()}
        assert out[2] == (0, 2)
        assert out[12] == (10, 2)
        assert out[13] == (10, 1)

    def test_cycle_raises(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            resolve_hierarchy,
        )

        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], "child long, parent long")
        with pytest.raises(RuntimeError, match="cycle"):
            resolve_hierarchy(e, max_rounds=8)


class TestBfsDepths:
    def test_path_graph_depths_and_component_scope(self, spark):
        from bigdata_tag_system_spark.operators.graph import bfs_depths

        # path 0-1-2-3 plus a disconnected edge 10-11: depths count
        # hops along the path, the other component never appears
        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (10, 11)], "src long, dst long")
        got = {r["node"]: r["depth"] for r in bfs_depths(e, 0).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 3}

    def test_cycle_takes_shortest_side(self, spark):
        from bigdata_tag_system_spark.operators.graph import bfs_depths

        # 5-cycle: the far node is 2 hops via either side, never 3
        e = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)],
            "src long, dst long")
        got = {r["node"]: r["depth"] for r in bfs_depths(e, 0).collect()}
        assert got == {0: 0, 1: 1, 4: 1, 2: 2, 3: 2}

    def test_diameter_guard_raises(self, spark):
        from bigdata_tag_system_spark.operators.graph import bfs_depths

        e = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], "src long, dst long")
        with pytest.raises(RuntimeError, match="max_rounds"):
            bfs_depths(e, 0, max_rounds=3)


class TestApplyChangeset:
    def test_mixed_ops_and_conflict_rejection(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.writers import (
            DuplicateKeyError, apply_changeset, write_parquet,
        )

        store = str(tmp_path / "store")
        write_parquet(spark.createDataFrame(
            [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double"), store)
        changes = spark.createDataFrame(
            [(2, 99.0, "upsert"), (3, None, "delete"),
             (4, 40.0, "upsert")],
            "k long, v double, _op string")
        out = {r.k: r.v for r in apply_changeset(
            spark, changes, store, key_cols=["k"]).collect()}
        assert out == {1: 10.0, 2: 99.0, 4: 40.0}
        # same key as both upsert and delete -> loud error
        bad = spark.createDataFrame(
            [(1, 1.0, "upsert"), (1, None, "delete")],
            "k long, v double, _op string")
        with pytest.raises(DuplicateKeyError, match="both"):
            apply_changeset(spark, bad, store, key_cols=["k"])
        unk = spark.createDataFrame(
            [(1, 1.0, "merge")], "k long, v double, _op string")
        with pytest.raises(ValueError, match="unknown op"):
            apply_changeset(spark, unk, store, key_cols=["k"])

    def test_mixed_violations_raise_bad_op_first_deterministically(
            self, spark, tmp_path):
        # >5 offender keys mixing BOTH violation kinds: the ordered
        # sample (bad-op offenders first) must always surface the
        # unknown-op ValueError, never partition-luck DuplicateKeyError
        from bigdata_tag_system_spark.sources.writers import (
            apply_changeset, write_parquet,
        )

        store = str(tmp_path / "store_mixed")
        write_parquet(spark.createDataFrame(
            [(1, 10.0)], "k long, v double"), store)
        rows = [(k, 1.0, "upsert") for k in range(10)]
        rows += [(k, None, "delete") for k in range(10)]   # 10 conflicts
        rows += [(99, 1.0, "merge")]                       # 1 bad op
        changes = spark.createDataFrame(
            rows, "k long, v double, _op string")
        for _ in range(3):
            with pytest.raises(ValueError, match="unknown op.*merge"):
                apply_changeset(spark, changes, store, key_cols=["k"])


# ---------------------------------------------------------------------------
# Hypothesis properties: random inputs vs pure-Python models
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    counts=st.lists(st.integers(1, 40), min_size=1, max_size=4),
    ratios=st.lists(
        st.sampled_from([0.0, 0.25, 0.5, 1.0, 1.5, 2.5]),
        min_size=4, max_size=4),
)
def test_epoch_oversample_matches_python_model(spark, counts, ratios):
    from bigdata_tag_system_spark.operators.sampling import (
        epoch_oversample, knuth_hash,
    )

    rows, rid = [], 0
    for si, c in enumerate(counts):
        for _ in range(c):
            rows.append((rid, f"s{si}"))
            rid += 1
    df = spark.createDataFrame(rows, "id long, src string")
    rmap = {f"s{si}": ratios[si] for si in range(len(counts))}
    got = sorted((r.id, r.copy_idx) for r in epoch_oversample(
        df, "src", "id", ratios=rmap, portable=True).collect())

    def kh(k):
        return ((k % 2147483648) * 2654435761) % 4294967296

    want = []
    for si, c in enumerate(counts):
        ids = [i for i, s in rows if s == f"s{si}"]
        target = (c * int(round(rmap[f"s{si}"] * 1_000_000))) // 1_000_000
        whole, extra = target // c, target % c
        ranked = sorted(ids, key=lambda i: (kh(i), i))
        for rank, i in enumerate(ranked, 1):
            k = whole + (1 if rank <= extra else 0)
            want.extend((i, ci) for ci in range(k))
    assert got == sorted(want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(seq=st.lists(
    st.tuples(st.integers(1, 3), st.sampled_from("xyz")),
    min_size=1, max_size=30))
def test_collapse_runs_matches_python_model(spark, seq):
    from bigdata_tag_system_spark.operators.features import collapse_runs
    import itertools

    rows = [(u, v, i, i) for i, (u, v) in enumerate(seq)]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts long, event_id long")
    got = sorted((r.user_id, r.event_type, r.run_start, r.run_end,
                  r.run_len) for r in collapse_runs(df).collect())
    want = []
    by_user = {}
    for u, v, t, _ in rows:
        by_user.setdefault(u, []).append((t, v))
    for u, evs in by_user.items():
        evs.sort()
        for v, grp in itertools.groupby(evs, key=lambda e: e[1]):
            g = list(grp)
            want.append((u, v, g[0][0], g[-1][0], len(g)))
    assert got == sorted(want)


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(
    st.floats(-1000, 1000, allow_nan=False).map(lambda x: round(x, 2)),
    min_size=1, max_size=200),
    nb=st.sampled_from([1, 4, 16]))
def test_histogram_matches_python_model(spark, vals, nb):
    from bigdata_tag_system_spark.operators.sketches import (
        histogram_equi_width,
    )

    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r.bucket: r.cnt
           for r in histogram_equi_width(df, "v", buckets=nb).collect()}
    cents = [int(round(v * 100)) for v in vals]
    vmin, vmax = min(cents), max(cents)
    span = vmax - vmin + 1
    want = {}
    for c in cents:
        b = (c - vmin) * nb // span
        want[b] = want.get(b, 0) + 1
    assert got == want


class TestCliExtensions:
    def test_dedup_corpus_mode(self, spark, sf_dir, tmp_path, capsys):
        from bigdata_tag_system_spark.cli import main
        import json

        out = str(tmp_path / "kept")
        rc = main(["--mode", "dedup-corpus",
                   "--facts", f"{sf_dir}/documents.parquet",
                   "--output", out, "--dedup-method", "minhash",
                   "--threshold", "0.5"])
        assert rc == 0
        line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert line["rows_in"] == line["rows_kept"] + line["rows_dropped"]
        # the corpus plants NEAR-dups (exact dedup would drop nothing)
        assert line["rows_dropped"] > 0
        assert spark.read.parquet(out).count() == line["rows_kept"]

    def test_quality_audit_gate_exit_codes(self, spark, sf_dir, tmp_path,
                                           capsys):
        from bigdata_tag_system_spark.cli import main
        import json

        ok_spec = tmp_path / "ok.json"
        ok_spec.write_text(json.dumps({"not_null": ["o_orderkey"]}))
        rc = main(["--mode", "quality-audit",
                   "--facts", f"{sf_dir}/orders.parquet",
                   "--audit-spec", str(ok_spec)])
        assert rc == 0
        bad_spec = tmp_path / "bad.json"
        # impossible range -> every row violates -> CI gate trips
        bad_spec.write_text(json.dumps(
            {"ranges": {"o_totalprice": [-2, -1]}}))
        rc = main(["--mode", "quality-audit",
                   "--facts", f"{sf_dir}/orders.parquet",
                   "--audit-spec", str(bad_spec)])
        assert rc == 1
        line = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert line["ok"] is False


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(st.integers(0, 255), st.integers(0, 255)),
                      min_size=1, max_size=50))
def test_zorder_matches_python_interleave(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    got = [r.z for r in df.select(
        zorder_value(["x", "y"], bits=8).alias("z")).collect()]

    def pz(x, y):
        z = 0
        for b in range(8):
            z |= ((x >> b) & 1) << (2 * b)
            z |= ((y >> b) & 1) << (2 * b + 1)
        return z

    assert sorted(got) == sorted(pz(x, y) for x, y in pairs)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=st.lists(
    st.tuples(st.sampled_from("ab"),
              st.lists(st.sampled_from(["t1", "t2", "t3", "t4"]),
                       min_size=1, max_size=8)),
    min_size=2, max_size=12))
def test_source_kl_matches_python_model(spark, docs):
    import math
    from collections import Counter

    rows = [(i, g, " ".join(toks)) for i, (g, toks) in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r.source: r.kl_nats
           for r in source_token_kl(df, group_col="source").collect()}
    per_g, total = {}, Counter()
    for _, g, toks in [(i, g, t) for i, (g, t) in enumerate(docs)]:
        per_g.setdefault(g, Counter()).update(toks)
        total.update(toks)
    n_all = sum(total.values())
    for g, cnt in per_g.items():
        ng = sum(cnt.values())
        want = sum((c / ng) * (math.log(c / ng) - math.log(total[t] / n_all))
                   for t, c in cnt.items())
        assert abs(got[g] - want) < 1e-9


class TestKmvIntersect:
    def test_small_groups_are_exact(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            kmv_intersect_check,
        )

        rows = ([("a", i) for i in range(40)]
                + [("b", i) for i in range(20, 70)])
        df = spark.createDataFrame(rows, "g string, k long")
        [r] = kmv_intersect_check(
            df, "a", "b", key_col="k", group_col="g", k=256).collect()
        # under k distinct keys the sketch IS the set: estimates exact
        assert (r.est_a, r.est_b, r.est_union) == (40.0, 50.0, 70.0)
        assert (r.exact_a, r.exact_b, r.exact_intersect) == (40, 50, 20)
        assert r.est_intersect == 20.0

    def test_estimation_path_within_tolerance(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            kmv_intersect_check,
        )

        # 3000 keys in a, 3000 in b, 1000 shared -> estimation path
        # (k=256 << distinct); KMV rse ~ 1/sqrt(k-1) ~ 6.3%, assert 4 rse
        rows = ([("a", i) for i in range(3000)]
                + [("b", i) for i in range(2000, 5000)])
        df = spark.createDataFrame(rows, "g string, k long")
        [r] = kmv_intersect_check(
            df, "a", "b", key_col="k", group_col="g", k=256).collect()
        assert abs(r.est_a - 3000) / 3000 < 0.25
        assert abs(r.est_b - 3000) / 3000 < 0.25
        assert abs(r.est_union - 5000) / 5000 < 0.25
        # intersection compounds union + jaccard error: generous bound
        assert abs(r.est_intersect - 1000) / 1000 < 0.5
        assert (r.exact_a, r.exact_b, r.exact_intersect) == (3000, 3000, 1000)

    def test_absent_group_reports_zero_row_not_empty(self, spark):
        # a requested group with no rows must yield ONE report row with
        # zero estimates, not an empty DataFrame (the 1-row cross joins
        # previously annihilated the result; reviewed r5)
        from bigdata_tag_system_spark.operators.sketches import (
            kmv_intersect_check,
        )

        rows = [("a", i) for i in range(40)]
        df = spark.createDataFrame(rows, "g string, k long")
        [r] = kmv_intersect_check(
            df, "a", "nope", key_col="k", group_col="g", k=256).collect()
        assert (r.est_a, r.est_b) == (40.0, 0.0)
        assert r.est_union == 40.0
        assert r.est_intersect == 0.0
        assert (r.exact_a, r.exact_b, r.exact_intersect) == (40, 0, 0)
        # both groups absent: still one all-zero row
        [r2] = kmv_intersect_check(
            df, "x", "y", key_col="k", group_col="g", k=256).collect()
        assert (r2.est_a, r2.est_b, r2.est_union, r2.est_intersect) == (
            0.0, 0.0, 0.0, 0.0)
        assert (r2.exact_a, r2.exact_b, r2.exact_intersect) == (0, 0, 0)


class TestPopulationStability:
    def test_psi_matches_closed_form(self, spark):
        import math

        from bigdata_tag_system_spark.operators.quality import (
            population_stability,
        )

        ref = spark.createDataFrame(
            [(float(v),) for v in [1, 1, 2, 5, 5, 5, 8, 9]], "x double")
        cmp_ = spark.createDataFrame(
            [(float(v),) for v in [1, 8, 8, 9, 9, 9, 12, 9]], "x double")
        rows = population_stability(
            ref, cmp_, "x", lo=0.0, hi=10.0, buckets=5).collect()
        assert [r.bucket for r in sorted(rows, key=lambda r: r.bucket)] \
            == [0, 1, 2, 3, 4]
        # recompute PSI in python with the same smoothing
        nr = {0: 2, 1: 1, 2: 3, 3: 0, 4: 2}
        nc = {0: 1, 1: 0, 2: 0, 3: 0, 4: 7}  # 12 clamps into bucket 4
        psi = 0.0
        for i in range(5):
            p = (nr[i] + 0.5) / (8 + 2.5)
            q = (nc[i] + 0.5) / (8 + 2.5)
            psi += (p - q) * math.log(p / q)
        got = {r.bucket: r for r in rows}
        for i in range(5):
            assert (got[i].n_ref, got[i].n_cmp) == (nr[i], nc[i])
        assert abs(sum(r.contrib for r in rows) - psi) < 1e-5

    def test_null_and_range_validation(self, spark):
        import pytest as _pt

        from bigdata_tag_system_spark.operators.quality import (
            population_stability,
        )

        df = spark.createDataFrame([(1.0,), (None,)], "x double")
        rows = population_stability(df, df, "x", 0.0, 1.0, 2).collect()
        assert sum(r.n_ref for r in rows) == 1  # NULL excluded
        with _pt.raises(ValueError):
            population_stability(df, df, "x", 1.0, 1.0, 2)
        with _pt.raises(ValueError):
            population_stability(df, df, "x", 0.0, 1.0, 1)
