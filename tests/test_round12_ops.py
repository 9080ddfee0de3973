"""Round-12 tests: the §2.10 UDAF/applyInArrow rungs, SQL-language
UDFs, ExactSubstr span removal, and the r11 ADVICE-fix regressions
(sink-deadline loudness, lease O_EXCL claim + pid-checked removal)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


class TestGroupedUdafGeomean:
    def test_udaf_matches_native_twin(self, spark, sf_dir):
        # the grouped-agg pandas UDAF and the built-in-expression twin
        # are the SAME aggregate — 1e-9 relative (two summation orders)
        from bigdata_tag_system_spark.functions.udaf_ops import (
            grouped_weighted_geomean, weighted_geomean_native,
        )

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        a = {r["l_returnflag"]: r["w_geomean"] for r in
             grouped_weighted_geomean(
                 li, "l_returnflag", "l_extendedprice",
                 "l_quantity").collect()}
        b = {r["l_returnflag"]: r["w_geomean"] for r in
             weighted_geomean_native(
                 li, "l_returnflag", "l_extendedprice",
                 "l_quantity").collect()}
        assert set(a) == set(b) and len(a) >= 2
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-9)

    def test_hand_computed_group(self, spark):
        # exp((1*ln4 + 3*ln2) / 4) = (4 * 2^3)^(1/4) = 32^(1/4)
        from bigdata_tag_system_spark.functions.udaf_ops import (
            grouped_weighted_geomean,
        )

        df = spark.createDataFrame(
            [("g", 4.0, 1.0), ("g", 2.0, 3.0)], "k string, v double, w double")
        out = grouped_weighted_geomean(df, "k", "v", "w").collect()
        assert out[0]["w_geomean"] == pytest.approx(32.0 ** 0.25, rel=1e-12)

    def test_zero_weight_group_is_null(self, spark):
        from bigdata_tag_system_spark.functions.udaf_ops import (
            grouped_weighted_geomean,
        )

        df = spark.createDataFrame(
            [("g", 4.0, 0.0)], "k string, v double, w double")
        v = grouped_weighted_geomean(df, "k", "v", "w").collect()[0][1]
        assert v is None  # undefined without weight mass, never a 0/0 crash


class TestApplyInArrowZscore:
    def test_matches_window_and_pandas_twins(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            normalize_per_user, normalize_per_user_arrow,
            normalize_per_user_pandas,
        )

        df = spark.createDataFrame(
            [("u1", 1, 10.0), ("u1", 2, 20.0), ("u1", 3, 30.0),
             ("u2", 4, 5.0), ("u2", 5, 5.0),   # zero variance -> 0.0
             ("u3", 6, 7.0)],                   # singleton -> 0.0
            "user_id string, event_id int, value double")

        def z(out):
            return {r["event_id"]: r["value_z"] for r in out.collect()}

        zw, za, zp = (z(f(df)) for f in (
            normalize_per_user, normalize_per_user_arrow,
            normalize_per_user_pandas))
        assert set(zw) == set(za) == set(zp)
        for k in zw:
            assert za[k] == pytest.approx(zw[k], abs=1e-12)
            assert zp[k] == pytest.approx(zw[k], abs=1e-12)
        assert za[4] == za[5] == za[6] == 0.0

    def test_arrow_preserves_all_input_columns(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            normalize_per_user_arrow,
        )

        df = spark.createDataFrame(
            [("u1", 1, 10.0, "x"), ("u1", 2, 20.0, "y")],
            "user_id string, event_id int, value double, extra string")
        out = normalize_per_user_arrow(df)
        assert out.columns == ["user_id", "event_id", "value", "extra",
                               "value_z"]
        assert out.count() == 2


class TestSqlUdfs:
    def test_scalar_udfs_inline_to_expression(self, spark):
        from bigdata_tag_system_spark.functions.udaf_ops import (
            register_sql_udfs,
        )

        register_sql_udfs(spark)
        row = spark.sql(
            "SELECT disc_price(100.0, 0.1, 0.05) AS p,"
            "       qty_band(5.0) AS b1, qty_band(15.0) AS b2,"
            "       qty_band(99.0) AS b3").collect()[0]
        assert row["p"] == pytest.approx(100.0 * 0.9 * 1.05, rel=1e-12)
        assert (row["b1"], row["b2"], row["b3"]) == ("low", "mid", "high")
        # no Python-executor node: the SQL UDF body must be INLINED
        plan = spark.sql(
            "SELECT disc_price(1.0, 0.0, 0.0)")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_registration_is_idempotent(self, spark):
        from bigdata_tag_system_spark.functions.udaf_ops import (
            register_sql_udfs,
        )

        register_sql_udfs(spark)
        register_sql_udfs(spark)  # CREATE OR REPLACE: no error
        assert spark.sql("SELECT qty_band(1.0) b").collect()[0]["b"] == "low"

    def test_invalid_definition_refuses(self, spark):
        from pyspark.errors import AnalysisException

        # body references a column that doesn't exist in the signature
        with pytest.raises((AnalysisException, Exception)) as e:
            spark.sql("""
                CREATE OR REPLACE TEMPORARY FUNCTION _bad_udf(x DOUBLE)
                RETURNS DOUBLE RETURN y + 1
            """)
        assert "y" in str(e.value) or "UNRESOLVED" in str(e.value).upper()

    def test_wrong_arity_call_refuses(self, spark):
        from bigdata_tag_system_spark.functions.udaf_ops import (
            register_sql_udfs,
        )

        register_sql_udfs(spark)
        with pytest.raises(Exception):
            spark.sql("SELECT qty_band(1.0, 2.0)").collect()

    def test_table_udf_rows(self, spark):
        from bigdata_tag_system_spark.functions.udaf_ops import (
            register_sql_table_udf,
        )

        register_sql_table_udf(spark)
        rows = {r["band"]: (r["lo"], r["hi"]) for r in
                spark.sql("SELECT * FROM qty_bands()").collect()}
        assert rows["low"] == (0.0, 10.0)
        assert rows["mid"] == (10.0, 30.0)
        assert len(rows) == 3


class TestSqlScripting:
    def test_while_loop_hand_check(self, spark):
        spark.conf.set("spark.sql.scripting.enabled", "true")
        row = spark.sql("""
            BEGIN
              DECLARE tot BIGINT DEFAULT 0;
              DECLARE i INT DEFAULT 0;
              WHILE i < 5 DO
                SET tot = tot + i * i;
                SET i = i + 1;
              END WHILE;
              SELECT tot AS sum_sq, i AS n;
            END
        """).collect()[0]
        assert (row["sum_sq"], row["n"]) == (30, 5)

    def test_undeclared_variable_refuses(self, spark):
        spark.conf.set("spark.sql.scripting.enabled", "true")
        with pytest.raises(Exception) as e:
            spark.sql("""
                BEGIN
                  SET nosuch = 1;
                  SELECT 1;
                END
            """).collect()
        assert "nosuch" in str(e.value).lower() or "VARIABLE" in str(
            e.value).upper()


class TestSqlParams:
    def test_named_positional_and_identifier(self, spark):
        spark.range(5).createOrReplaceTempView("_t5_params")
        n1 = spark.sql("SELECT count(*) AS n FROM _t5_params WHERE id >= :lo",
                       args={"lo": 2}).collect()[0]["n"]
        n2 = spark.sql("SELECT count(*) AS n FROM _t5_params WHERE id >= ?",
                       args=[3]).collect()[0]["n"]
        n3 = spark.sql("SELECT count(*) AS n FROM IDENTIFIER(:tbl)",
                       args={"tbl": "_t5_params"}).collect()[0]["n"]
        assert (n1, n2, n3) == (3, 2, 5)

    def test_injection_payload_stays_a_value(self, spark):
        # the classic payload must bind as a literal STRING: zero rows
        # match it, and the query must NOT degenerate to select-all
        spark.range(5).selectExpr("cast(id AS string) AS s") \
            .createOrReplaceTempView("_t5_inject")
        n = spark.sql(
            "SELECT count(*) AS n FROM _t5_inject WHERE s = :payload",
            args={"payload": "0' OR '1'='1"}).collect()[0]["n"]
        assert n == 0

    def test_identifier_rejects_malformed_names(self, spark):
        with pytest.raises(Exception):
            spark.sql("SELECT count(*) FROM IDENTIFIER(:tbl)",
                      args={"tbl": "_t5_params; DROP TABLE x"}).collect()

    def test_missing_parameter_refuses(self, spark):
        with pytest.raises(Exception):
            spark.sql("SELECT :absent AS v").collect()


class TestRemoveDuplicatedSpans:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_no_duplicates_passthrough(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            remove_duplicated_spans,
        )

        df = self._df(spark, [
            (1, "a b c d e f g h i j"),
            (2, "k l m n o p q r s t"),
        ])
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(df, n=8, min_docs=2).collect()}
        assert out[1]["removed_tokens"] == 0
        assert out[1]["cleaned_text"] == "a b c d e f g h i j"
        assert out[2]["removed_tokens"] == 0

    def test_insertion_robust_cross_doc_removal(self, spark):
        # the same 9-token passage planted at DIFFERENT offsets in two
        # docs is removed from BOTH — offset shifts must not matter
        # (the ExactSubstr property fixed-segment schemes lack)
        from bigdata_tag_system_spark.operators.text import (
            remove_duplicated_spans,
        )

        dup = "the quick brown fox jumps over the lazy dog"
        df = self._df(spark, [
            (1, f"alpha beta {dup} gamma delta"),
            (2, f"one two three four five {dup} six"),
        ])
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(df, n=8, min_docs=2).collect()}
        # dup is 9 tokens => two overlapping 8-shingles, one island,
        # cover = [start, start+8] = 9 tokens, in each doc
        assert out[1]["removed_tokens"] == 9
        assert out[2]["removed_tokens"] == 9
        assert out[1]["cleaned_text"] == "alpha beta gamma delta"
        assert out[2]["cleaned_text"] == "one two three four five six"

    def test_full_removal_yields_empty_text(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            remove_duplicated_spans,
        )

        same = "a b c d e f g h"
        df = self._df(spark, [(1, same), (2, same)])
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(df, n=8, min_docs=2).collect()}
        for d in (1, 2):
            assert out[d]["removed_tokens"] == 8
            assert out[d]["cleaned_text"] == ""

    def test_two_disjoint_islands(self, spark):
        # two separate duplicated runs in one doc -> two islands, both
        # subtracted, the text BETWEEN them kept
        from bigdata_tag_system_spark.operators.text import (
            remove_duplicated_spans,
        )

        d1 = "p q r s t u v w"          # 8 tokens, island 1
        d2 = "h i j k l m n o"          # 8 tokens, island 2
        df = self._df(spark, [
            (1, f"{d1} KEEP ME HERE {d2}"),
            (2, f"zz {d1} yy"),
            (3, f"xx {d2} ww"),
        ])
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(df, n=8, min_docs=2).collect()}
        assert out[1]["removed_tokens"] == 16
        assert out[1]["cleaned_text"] == "keep me here"

    def test_short_and_null_docs_survive(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            remove_duplicated_spans,
        )

        df = self._df(spark, [(1, "too short"), (2, None), (3, "")])
        out = {r["doc_id"]: r for r in
               remove_duplicated_spans(df, n=8, min_docs=2).collect()}
        assert out[1]["removed_tokens"] == 0
        assert out[1]["cleaned_text"] == "too short"
        assert out[2]["removed_tokens"] == 0
        assert out[3]["removed_tokens"] == 0

    def test_invalid_n_refuses(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            remove_duplicated_spans,
        )

        with pytest.raises(ValueError, match="positive"):
            remove_duplicated_spans(self._df(spark, [(1, "x")]), n=0)


class TestAsofCogrouped:
    def test_matches_native_asof_with_ties_and_one_sided_keys(self, spark):
        from bigdata_tag_system_spark.operators.timeseries import (
            asof_join, asof_join_cogrouped,
        )

        left = spark.createDataFrame(
            [(1, "u1", 10), (2, "u1", 20), (3, "u2", 5), (4, "u3", 9)],
            "event_id int, user_id string, ts int")
        right = spark.createDataFrame(
            [("u1", 10, 1.0), ("u1", 10, 7.0),   # tie at ts=10
             ("u1", 15, 2.0), ("u2", 6, 3.0),    # u2: only future rows
             ("u4", 1, 9.0)],                    # u4: no left rows
            "user_id string, ts int, value double")

        def z(df):
            return {r["event_id"]: r["value_asof"] for r in df.collect()}

        got = z(asof_join_cogrouped(left, right, value_cols=["value"]))
        want = z(asof_join(left, right, value_cols=["value"]))
        assert got == want
        assert got[1] == 7.0          # greatest value wins the ts tie
        assert got[2] == 2.0
        assert got[3] is None and got[4] is None
        # r14: coarse-bucket mode (merge_asof by= inside hash buckets)
        # must reproduce the per-key result exactly, for any bucket
        # count — including n=1 (everything in one frame) and a count
        # larger than the key count
        for nb in (1, 2, 97):
            assert z(asof_join_cogrouped(
                left, right, value_cols=["value"],
                coarse_buckets=nb)) == want

    def test_coarse_buckets_refuses_null_keys(self, spark):
        from bigdata_tag_system_spark.operators.timeseries import (
            asof_join_cogrouped,
        )

        left = spark.createDataFrame(
            [(1, None, 10)], "event_id int, user_id string, ts int")
        right = spark.createDataFrame(
            [(None, 5, 1.0)], "user_id string, ts int, value double")
        with pytest.raises(Exception, match="NULL join keys"):
            asof_join_cogrouped(
                left, right, value_cols=["value"],
                coarse_buckets=4).collect()

    def test_self_cogroup_shared_lineage(self, spark, sf_dir):
        # both sides filtered from ONE scan — the shared-attribute-id
        # shape where cogroup silently dropped the right ts column
        # before the same-name re-alias guard
        from bigdata_tag_system_spark.operators.timeseries import (
            asof_join, asof_join_cogrouped,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "event_type", "value")
        left = ev.where("event_type = 'click'").select(
            "event_id", "user_id",
            F.col("event_id").alias("ts"))
        right = ev.where("event_type = 'purchase'").select(
            "user_id", F.col("event_id").alias("ts"), "value")
        a = {r["event_id"]: r["value_asof"] for r in
             asof_join_cogrouped(left, right, value_cols=["value"]).collect()}
        b = {r["event_id"]: r["value_asof"] for r in
             asof_join(left, right, value_cols=["value"]).collect()}
        assert a == b and len(a) > 0


class TestAsofCoArrow:
    def test_matches_pandas_cogroup_and_native(self, spark):
        from bigdata_tag_system_spark.operators.timeseries import (
            asof_join, asof_join_coarrow, asof_join_cogrouped,
        )

        left = spark.createDataFrame(
            [(1, "u1", 10), (2, "u1", 20), (3, "u2", 5), (4, "u3", 9)],
            "event_id int, user_id string, ts int")
        right = spark.createDataFrame(
            [("u1", 10, 1.0), ("u1", 10, 7.0), ("u1", 15, 2.0),
             ("u2", 6, 3.0), ("u4", 1, 9.0)],
            "user_id string, ts int, value double")

        def z(df):
            return {r["event_id"]: r["value_asof"] for r in df.collect()}

        ga = z(asof_join_coarrow(left, right, value_cols=["value"]))
        assert ga == z(asof_join_cogrouped(left, right,
                                           value_cols=["value"]))
        assert ga == z(asof_join(left, right, value_cols=["value"]))
        assert ga[1] == 7.0

    def test_null_timestamps_refuse_loudly(self, spark):
        # merge_asof can't take NULL keys and the Arrow two-pointer
        # would TypeError — both twins must refuse with a clear
        # contract error instead of a worker crash (native asof_join
        # stays the supported path for SQL null ordering)
        from pyspark.errors import PythonException

        from bigdata_tag_system_spark.operators.timeseries import (
            asof_join_coarrow, asof_join_cogrouped,
        )

        left = spark.createDataFrame(
            [(1, "u1", 10), (2, "u1", None)],
            "event_id int, user_id string, ts int")
        right = spark.createDataFrame(
            [("u1", 5, 1.0)], "user_id string, ts int, value double")
        for fn in (asof_join_cogrouped, asof_join_coarrow):
            with pytest.raises(PythonException, match="non-null key"):
                fn(left, right, value_cols=["value"]).collect()

    def test_real_events_parity(self, spark, sf_dir):
        from bigdata_tag_system_spark.operators.timeseries import (
            asof_join, asof_join_coarrow,
        )

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
            "event_id", "user_id", "event_type", "value")
        left = ev.where("event_type = 'click'").select(
            "event_id", "user_id", F.col("event_id").alias("ts"))
        right = ev.where("event_type = 'purchase'").select(
            "user_id", F.col("event_id").alias("ts"), "value")
        a = {r["event_id"]: r["value_asof"] for r in
             asof_join_coarrow(left, right, value_cols=["value"]).collect()}
        b = {r["event_id"]: r["value_asof"] for r in
             asof_join(left, right, value_cols=["value"]).collect()}
        assert a == b and len(a) > 0


class TestHardNegativeMining:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(1, "data data query table"),     # strong q1 match
             (2, "data query"),                # strong q1 match
             (3, "data lake house"),           # weak q1 match
             (4, "stream window state"),       # q2 only
             (5, "totally unrelated words")],
            "doc_id long, text string")

    def test_positives_removed_and_ranked(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            hard_negative_mining,
        )

        out = hard_negative_mining(
            self._docs(spark),
            queries={"q1": ["data", "query"], "q2": ["stream"]},
            positives={"q1": [1]}, k=10)
        rows = {(r["query_id"], r["doc_id"]): r["rank"]
                for r in out.collect()}
        # doc 1 (the labeled positive) must be gone from q1 entirely;
        # the remaining matches re-rank from 1
        assert ("q1", 1) not in rows
        assert rows[("q1", 2)] == 1 and rows[("q1", 3)] == 2
        assert rows[("q2", 4)] == 1
        assert ("q1", 5) not in rows and ("q2", 5) not in rows

    def test_single_query_matches_bm25_topk(self, spark):
        # with no positives, one query's ranking must equal bm25_topk
        from bigdata_tag_system_spark.operators.text import (
            bm25_topk, hard_negative_mining,
        )

        docs = self._docs(spark)
        hn = hard_negative_mining(
            docs, queries={"q": ["data", "query"]}, positives={}, k=3)
        got = [(r["doc_id"], round(r["score"], 10))
               for r in hn.orderBy("rank").collect()]
        want = [(r["doc_id"], round(r["score"], 10))
                for r in bm25_topk(docs, ["data", "query"], k=3).collect()]
        assert got == want

    def test_empty_queries_refuse(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            hard_negative_mining,
        )

        with pytest.raises(ValueError, match="at least one query"):
            hard_negative_mining(self._docs(spark), {}, {})
        with pytest.raises(ValueError, match="no terms"):
            hard_negative_mining(self._docs(spark), {"q": []}, {})


class TestHeapsFit:
    def test_perfect_power_law_recovered(self, spark):
        # plant a corpus whose type growth is EXACTLY V = n^0.5 at the
        # checkpoints: doc k contributes 2k+1 tokens of which... easier
        # exact plant: every doc has 4 unigram tokens, doc k introduces
        # exactly 2 new 1-gram types -> V = 2(k+1), n = 4(k+1): ln-ln
        # slope is exactly 1 with K = 0.5 (V = 0.5 * n)
        from bigdata_tag_system_spark.operators.text import heaps_fit

        rows = [(k, f"w{2*k} w{2*k} w{2*k+1} w{2*k+1}")
                for k in range(12)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = heaps_fit(df, bucket_docs=1, gram_n=1).collect()[0]
        assert r["n_points"] == 12
        assert r["beta"] == pytest.approx(1.0, abs=1e-9)
        assert r["k"] == pytest.approx(0.5, rel=1e-9)
        assert r["r2"] == pytest.approx(1.0, abs=1e-9)

    def test_saturated_vocab_flat_beta(self, spark):
        # identical docs: all types seen in bucket 0 -> beta == 0.0
        # (and normalized +0.0, never -0.0)
        from bigdata_tag_system_spark.operators.text import heaps_fit

        df = spark.createDataFrame(
            [(k, "a b c d") for k in range(8)], "doc_id long, text string")
        r = heaps_fit(df, bucket_docs=2, gram_n=1).collect()[0]
        assert r["beta"] == 0.0
        import math
        assert math.copysign(1.0, r["beta"]) == 1.0

    def test_invalid_params_refuse(self, spark):
        from bigdata_tag_system_spark.operators.text import heaps_fit

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="bucket_docs"):
            heaps_fit(df, bucket_docs=0)
        with pytest.raises(ValueError, match="gram_n"):
            heaps_fit(df, gram_n=0)


class TestZoneMapReport:
    def test_footer_stats_and_skip_decision(self, spark, tmp_path):
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        df = spark.createDataFrame(
            [(i, i // 10) for i in range(40)], "k long, bucket long")
        path = str(tmp_path / "layout")
        df.repartition("bucket").write.partitionBy("bucket").parquet(path)
        out = {r["bucket"]: r for r in
               zone_map_report(spark, path, "k", lo=15, hi=22).collect()}
        assert len(out) == 4
        # bucket 1 holds k in [10,19] -> overlaps [15,22] -> no skip;
        # bucket 2 holds [20,29] -> overlaps; buckets 0 and 3 skip
        assert (out[0]["skip"], out[1]["skip"],
                out[2]["skip"], out[3]["skip"]) == (1, 0, 0, 1)
        assert out[1]["zone_min"] == 10 and out[1]["zone_max"] == 19
        assert out[2]["n_rows"] == 10

    def test_multiple_files_per_bucket_aggregate(self, spark, tmp_path):
        # without the single-task repartition a bucket spans files; the
        # report must aggregate per GROUP, not per file
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        df = spark.createDataFrame(
            [(i, 0) for i in range(30)], "k long, bucket long")
        path = str(tmp_path / "layout2")
        df.repartition(3).write.partitionBy("bucket").parquet(path)
        out = zone_map_report(spark, path, "k", lo=100, hi=200).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["n_rows"], r["zone_min"], r["zone_max"], r["skip"]) \
            == (30, 0, 29, 1)

    def test_empty_dir_refuses(self, spark, tmp_path):
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        with pytest.raises(ValueError, match="no parquet files"):
            zone_map_report(spark, str(tmp_path), "k", 0, 1)

    def test_unmatched_group_pattern_refuses(self, spark, tmp_path):
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        path = str(tmp_path / "flat")
        spark.range(5).write.parquet(path)
        with pytest.raises(ValueError, match="group pattern"):
            zone_map_report(spark, path, "id", 0, 1)


class TestLeaseConcurrency:
    def test_second_writer_refuses_while_lease_held(self, spark, tmp_path):
        # O_EXCL claim: a concurrent writer targeting the same next
        # version fails at claim time instead of clobbering the
        # winner's heartbeat in its error path (ADVICE r11, low)
        from bigdata_tag_system_spark.sources.versioned import (
            _lease_path, write_version,
        )

        store = str(tmp_path / "store")
        os.makedirs(store)
        df = spark.range(3).select(F.col("id").alias("k"))
        # simulate a writer already in flight for v1
        with open(_lease_path(store, 1), "w") as f:
            f.write("99999:other")
        with pytest.raises(RuntimeError, match="concurrent"):
            write_version(df, store)
        # the in-flight writer's lease is UNTOUCHED
        with open(_lease_path(store, 1)) as f:
            assert f.read() == "99999:other"

    def test_stale_lease_reclaimed_not_wedged(self, spark, tmp_path):
        # a writer SIGKILL'd after claiming the lease but before v{n}
        # materialized leaves a lease gc_orphans can't see (no v{n}
        # dir); write_version must reclaim it once the heartbeat is
        # stale instead of wedging the store forever
        from bigdata_tag_system_spark.sources.versioned import (
            _lease_path, write_version,
        )

        store = str(tmp_path / "store3")
        os.makedirs(store)
        lease = _lease_path(store, 1)
        with open(lease, "w") as f:
            f.write("99999:dead")
        old = time.time() - 3600
        os.utime(lease, (old, old))  # heartbeat died an hour ago
        df = spark.range(3).select(F.col("id").alias("k"))
        assert write_version(df, store) == 1
        assert not os.path.exists(lease)

    def test_lease_removed_after_own_write(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.versioned import (
            _lease_path, read_version, write_version,
        )

        store = str(tmp_path / "store2")
        df = spark.range(3).select(F.col("id").alias("k"))
        v = write_version(df, store)
        assert v == 1
        assert not os.path.exists(_lease_path(store, 1))
        assert read_version(spark, store).count() == 3
