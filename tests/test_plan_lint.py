"""Plan linting: each hazard detector fires on a crafted offender and
stays silent on the scalable formulation of the same job."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from bigdata_tag_system_spark.plans.lint import assert_scalable, plan_warnings


@pytest.fixture(scope="module")
def df(spark):
    return spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 7).alias("k"))


def _keys(warnings):
    return {w.split(":", 1)[0] for w in warnings}


class TestDetectors:
    def test_cartesian(self, spark, df):
        # small inputs broadcast into a nested loop (legitimate — the
        # engine uses one-row broadcasts deliberately); the detector
        # targets the SHUFFLED CartesianProduct a big×big cross join
        # degrades to, forced here via hint
        bad = df.hint("shuffle_replicate_nl").crossJoin(
            df.selectExpr("id AS id2", "k AS k2"))
        assert "cartesian" in _keys(plan_warnings(bad))
        good = df.join(df.selectExpr("id AS id", "k AS k2"), "id")
        assert "cartesian" not in _keys(plan_warnings(good))

    def test_bnl_join_flags_data_sized_build_only(self, spark, df):
        other = df.selectExpr("id AS id2", "k AS k2")
        # data-sized build side broadcast into a nested loop -> hazard
        # (a 100-row Range is itself statically bounded, so the build
        # must exceed the literal-Range smallness fence to count as
        # data-sized)
        wide = spark.range(100_000).selectExpr("id AS id2")
        bad = F.broadcast(wide).crossJoin(df)
        assert "bnl_join" in _keys(plan_warnings(bad))
        # the engine's scalar-aggregate crossJoin idiom: 1-row build,
        # bounded by construction -> NO allowance needed
        one = df.agg(F.count(F.lit(1)).alias("n"))
        assert "bnl_join" not in _keys(
            plan_warnings(df.crossJoin(F.broadcast(one))))
        # limited build side -> bounded
        top = other.orderBy("id2").limit(3)
        assert "bnl_join" not in _keys(
            plan_warnings(df.crossJoin(F.broadcast(top))))
        # a small literal Range is statically sized -> bounded
        seed = spark.range(1).select(F.lit(0).alias("z"))
        assert "bnl_join" not in _keys(plan_warnings(df.crossJoin(seed)))
        # keyed hash join stays clean
        assert "bnl_join" not in _keys(
            plan_warnings(df.join(other.withColumnRenamed("id2", "id"),
                                  "id")))

    def test_python_row_udf(self, spark, df):
        from pyspark.sql.functions import pandas_udf, udf

        slow = udf(lambda x: x + 1, "bigint")
        assert "python_row_udf" in _keys(plan_warnings(df.select(slow("id"))))

        @pandas_udf("long")
        def fast(s):
            return s + 1

        assert "python_row_udf" not in _keys(plan_warnings(df.select(fast("id"))))

    def test_global_window(self, spark, df):
        bad = df.select(F.row_number().over(Window.orderBy("id")).alias("rn"))
        assert "global_window" in _keys(plan_warnings(bad))
        good = df.select(F.row_number().over(
            Window.partitionBy("k").orderBy("id")).alias("rn"))
        assert "global_window" not in _keys(plan_warnings(good))

    def test_rdd_scan(self, spark, df):
        rdd = spark.sparkContext.parallelize([(1,), (2,)])
        bad = spark.createDataFrame(rdd, "x int")
        assert "rdd_scan" in _keys(plan_warnings(bad))
        assert "rdd_scan" not in _keys(plan_warnings(df))


class TestAssert:
    def test_raises_with_findings(self, spark, df):
        bad = df.hint("shuffle_replicate_nl").crossJoin(
            df.selectExpr("id AS id2"))
        with pytest.raises(ValueError, match="cartesian"):
            assert_scalable(bad)

    def test_explicit_allow(self, spark, df):
        ranked = df.orderBy("id").limit(5).select(
            F.row_number().over(Window.orderBy("id")).alias("rn"))
        # bounded input makes the global window acceptable — but only
        # via a loud opt-out
        assert_scalable(ranked, allow=["global_window"])
        with pytest.raises(ValueError, match="global_window"):
            assert_scalable(ranked)

    def test_unknown_allow_key_rejected(self, df):
        with pytest.raises(ValueError, match="unknown hazard"):
            assert_scalable(df, allow=["no_such_check"])


# THE ENTIRE catalog is lint-clean as a test invariant: every
# `queries()` entry's physical plan passes `assert_scalable`.
# Allowances are the three legitimate, bounded patterns the engine uses
# ON PURPOSE (each documented at its source):
# - rdd_scan from localCheckpoint (deliberate lineage truncation in the
#   iterative CC rounds — every query composing connected components
#   inherits it) or from a deliberately tiny in-memory relation (the
#   one-row quantization scale vector; the inline-rows demo; the
#   broadcast tag-definition dim);
# - global_window over relations bounded by construction (the ≤4096-row
#   bucket-offset table; top-50 rank-fusion inputs).
_CATALOG_ALLOW = {
    "tag_enriched": ["rdd_scan"],
    "inline_rows": ["rdd_scan"],
    "dedup_components": ["rdd_scan"],
    "dedup_cluster_sizes": ["rdd_scan"],
    "dedup_pipeline_keep": ["rdd_scan"],
    "dedup_pipeline_keep_best": ["rdd_scan"],
    "dedup_semantic_keep": ["rdd_scan"],
    # (sim_quantized_topk / sim_quantized_recall carry their rdd_scan
    # allowance — the one-row quantization scale vector — in the
    # bnl_join block below)
    "graph_event_pagerank": ["rdd_scan"],
    # pointer-doubling rounds truncate lineage via localCheckpoint,
    # same as the CC / PageRank loops above
    "graph_part_hierarchy": ["rdd_scan"],
    # BFS frontiers are localCheckpoint-ed per round
    "graph_bfs_depths": ["rdd_scan"],
    # k-core keep-sets are localCheckpoint-ed per peel round
    "graph_kcore": ["rdd_scan"],
    # LPA labels are localCheckpoint-ed per round, same loop discipline
    "graph_lpa_communities": ["rdd_scan"],
    # r13: the reused degree/edge relations are lazy-localCheckpoint-ed
    # so the edge scan + degree shuffle run once, not per consumer
    # (operators/graph.py degree_assortativity / edge_common_neighbors)
    "graph_assortativity": ["rdd_scan"],
    # (graph_edge_jaccard's r13 degree checkpoint was reverted in r14 —
    # it regressed the query; no rdd_scan leaf remains in its plan)
    # r13: postings + pair-score relations feed multiple consumers;
    # lazy-checkpointed once each (operators/text.py tfidf_cosine_topk)
    "sim_tfidf_cosine": ["rdd_scan"],
    # r13: the bigram transition table feeds three consumers —
    # lazy-checkpointed (operators/text.py bigram_lm_scores). The
    # cross-scores twin's checkpoint was reverted in r14 (it regressed
    # text_cross_ppl), so only the self-trained entry keeps the leaf.
    "text_bigram_lm": ["rdd_scan"],
    # r13: (category, fold) stats feed four consumers —
    # lazy-checkpointed (operators/features.py target_encode)
    "feat_target_encode": ["rdd_scan"],
    # r13: the shingle relation feeds CountVectorizer fit + transform —
    # lazy-checkpointed (operators/ml_interop.py minhash_lsh_ml_pairs)
    "ml_minhash_parity": ["rdd_scan"],
    # r13: further multiply-consumed relations lazy-checkpointed at
    # their operators (same pattern, documented at each site):
    # bm25's narrow (id,len)/(id,term,tf) relations (text.py bm25_topk)
    "text_bm25_topk": ["rdd_scan"],
    # tf feeds document frequencies + score join (text.py)
    "text_tfidf_top_terms": ["rdd_scan"],
    # chunk relation feeds hot census + coverage join (text.py)
    "text_cdc_chunks": ["rdd_scan"],
    # basket relation feeds count/item/self-join consumers (entry)
    "orders_assoc_rules": ["rdd_scan"],
    # SRP base feeds band explode + both verify sides (embeddings.py)
    "emb_srp_pairs": ["rdd_scan"],
    # scored corpus feeds exact top-10 + four nprobe configs (entry)
    "sim_nprobe_recall_curve": ["rdd_scan"],
    # sessionized rows feed kept-prefix edges + empty-conv probe
    # (features.py markov_attribution)
    "events_markov_attribution": ["rdd_scan"],
    # pair-reduced shingle relation feeds both join sides (dedup.py
    # idf_weighted_rescore)
    "dedup_idf_jaccard": ["rdd_scan"],
    # unioned index+batch sketch relation feeds the band self-join (2
    # sides) and both Jaccard-verify sides — lazy-checkpointed
    # (dedup.py minhash_dedup_incremental), same deliberate lineage
    # truncation as the other dedup_* entries
    "dedup_incremental": ["rdd_scan"],
    # quantity distribution materialized once, probed by the script's
    # driver loop (entry func_sql_scripting)
    "func_sql_scripting": ["rdd_scan"],
    # lineitem⋈orders 3-column projection feeds the per-order
    # aggregate AND the blamed-supplier distinct — lazy-checkpointed
    # (entry tpch_q21; r13 commit e2d58af, allowance added r14)
    "tpch_q21": ["rdd_scan"],
    # LSH pair relation feeds both sides of the dup-id union (entry)
    "dedup_rates_by_source": ["rdd_scan"],
    # per-nation aggregate feeds rollup + share join (entry)
    "orders_share_of_region": ["rdd_scan"],
    # text_udtf_chunks IS the documented §2.10 slow-path demo: a Python
    # UDTF is by definition a per-row Python round-trip; the catalog
    # keeps exactly one such entry, with the native chunker as the
    # production twin (operators/text.py:chunk_documents)
    "text_udtf_chunks": ["python_row_udf"],
    # func_udtf_analyze is the SECOND and last UDTF entry — the
    # analyze()-polymorphic surface (schema computed at plan time);
    # same per-row-Python price, same pure-function oracle contract,
    # production twin = native get_json_object/VARIANT extraction
    "func_udtf_analyze": ["python_row_udf"],
    # (sketch_hist_quantiles — cumulative pass over the MERGED ≤64-row
    # histogram — carries global_window in the bnl_join block below)
    "sample_shuffle_order": ["global_window"],
    "sim_hybrid_rrf": ["global_window", "rdd_scan"],  # r13: bm25's
    # checkpointed narrow relations ride into the fused plan
    # the RANGE window merges PER-BUCKET sketches — one row per day,
    # bounded by the calendar, not by fact volume
    "sketch_hll_sliding": ["global_window"],
    # the product-limit cumulative window runs on per-lifetime-day
    # rows (calendar-bounded), after the per-user aggregation
    "events_survival_km": ["global_window"],
    # Nelson–Aalen shares the KM per-lifetime-day frame exactly
    "events_hazard_na": ["global_window"],
    # textbook RFM IS a global quintile ranking of customers; the
    # approx-fence variant (text_quality_tiers pattern) is the
    # sort-free scale path when |customers| outgrows one pass
    "customer_rfm_segments": ["global_window"],
    # lag(12) over the month series — calendar-bounded rows
    "orders_monthly_yoy": ["global_window"],
    # largest-remainder rank runs over the per-GROUP relation
    # (≤ #sources rows), never data rows
    "sample_temperature_alloc": ["global_window"],
    # same Hamilton rank over the per-source relation; the selection
    # window itself is PARTITIONED by source (the lint hit is the
    # allocation stage only)
    "corpus_build_plan": ["global_window", "rdd_scan"],  # r13:
    # base/annotated relations checkpointed (sampling.py)
    # same Hamilton machinery over the per-stratum relation
    "sample_neyman_alloc": ["global_window"],
    # Pareto deciles are a global revenue ranking by definition (see
    # customer_rfm_segments above for the fence-based scale path)
    "customer_revenue_concentration": ["global_window"],
    # Zipf rank window runs over the TakeOrdered top-100 spectrum —
    # bounded by construction, never the vocabulary
    "text_zipf_fit": ["global_window"],
    # KS bucket-offset cumulative runs over the ≤64-row bucket-total
    # relation (sample_shuffle_order pattern); data rows only ever see
    # a PARTITIONED window
    "quality_ks_drift": ["global_window"],
    # the U-statistic cumulative runs over DISTINCT integer-cents
    # values (the value domain, not fact rows); when a metric's
    # distinct values outgrow one task, switch to the two-level
    # bucketed cumsum quality_ks_drift uses
    "stats_mann_whitney": ["global_window"],
    # ACF lags / MA trend run over the one-row-per-day series —
    # calendar-bounded, same class as orders_monthly_yoy
    "ts_autocorrelation": ["global_window", "rdd_scan"],  # r13:
    # daily series checkpointed (one fact scan for range+join)
    "ts_seasonal_decompose": ["global_window", "rdd_scan"],  # r13:
    # det/seas checkpointed (timeseries.py seasonal_decompose)
    # SES closed-form cumsum + lag run over the one-row-per-day
    # series — calendar-bounded, same class as ts_autocorrelation
    "ts_ses_backtest": ["global_window"],
    # the centered-MA trend window runs over the one-row-per-day
    # series — same class as ts_seasonal_decompose, which it extends
    "ts_stl_outliers": ["global_window", "rdd_scan"],  # r13:
    # det/scored checkpointed (timeseries.py seasonal_outliers)
    # the DFT row index runs over the one-row-per-day series —
    # calendar-bounded, same class as ts_autocorrelation
    "ts_periodogram": ["global_window"],
    # pair space AND median windows are calendar²-bounded: the
    # self-join takes day-series rows (never facts) on both sides, so
    # the BNL/cartesian pair relation is ≤ (#days choose 2) — the one
    # documented calendar-quadratic plan; the ranking windows run over
    # that same bounded relation
    "ts_theil_sen": ["global_window", "bnl_join", "cartesian"],
    # ABC is a Pareto ranking of the ITEM dimension by definition —
    # same class as customer_revenue_concentration
    "orders_abc_xyz": ["global_window", "rdd_scan"],  # r13: per-item
    # moments checkpointed (feed total + ranked window)
    # the skyline running-max window runs over the DISTINCT-x relation
    # (per-x max(y) aggregate output), never input rows — same
    # dimension-ranking class as customer_revenue_concentration
    "orders_pareto_front": ["global_window"],
    # --- bnl_join: the detector is structure-aware (one-row scalar
    # aggregates, limits, literal tables, small Ranges pass without
    # allowance); the entries below broadcast relations that are
    # bounded by CONSTRUCTION but not provable from the plan alone —
    # except dedup_cosine_pairs, the one documented data-sized brute
    # mode (oracle-eval twin; knn_join_bucketed is the scale path):
    "dedup_cosine_pairs": ["bnl_join"],
    # build side is an explicit `vec_id IN (1,2,3)` filter — ≤3 query
    # rows; the large-query-set twin is sim_knn_bucketed (hash join)
    "sim_knn_join": ["bnl_join"],
    # the 1-row per-dimension scale vector (same relation as the
    # rdd_scan allowance above — createDataFrame hides its 1-row bound)
    "sim_quantized_topk": ["rdd_scan", "bnl_join"],
    "sim_quantized_recall": ["rdd_scan", "bnl_join"],
    # KMV sketch relations are ≤k=256 rows/side by the rank-k filter;
    # the estimate frames are 1-row aggregates keyed by a constant
    "sketch_kmv_intersect": ["bnl_join", "rdd_scan"],  # r13: the
    # ≤2-row per-group sketch checkpointed (sketches.py)
    # cumulative offsets over the merged ≤64-bucket histogram (the
    # relation already carrying the global_window allowance)
    "sketch_hist_quantiles": ["global_window", "bnl_join"],
    # explicit-register HLL: ≤2^p register rows; exact-truth frame is
    # a constant-keyed 1-row aggregate
    "sketch_hll_portable": ["bnl_join"],
    # the Heaps cumulative runs over the CHECKPOINT-BUCKET relation
    # (corpus/bucket_docs rows — config-sized by bucket choice, never
    # doc or token rows; two-level bucketed cumsum is the documented
    # fallback) — same class as quality_ks_drift's bucket offsets
    "text_heaps_fit": ["global_window"],
    # the input is the FILE LIST of the audited layout (one row per
    # parquet file — metadata-sized by definition; a cluster deployment
    # lists via the catalog/FS API into the same shape); row data is
    # never scanned — executors open footers only
    "layout_zone_skip": ["rdd_scan"],
}


def _all_catalog_names():
    import __spark_entry__ as entry

    return list(entry._build_queries())


class TestCatalogPlansClean:
    @pytest.mark.parametrize("name", _all_catalog_names())
    def test_catalog_query_plan(self, spark, sf_dir, name):
        import __spark_entry__ as entry

        fn = entry._build_queries()[name]
        assert_scalable(fn(spark, sf_dir),
                        allow=_CATALOG_ALLOW.get(name, []))


class TestEngineOpsAreClean:
    # rdd_scan is allow-listed below because the INPUT fixtures are
    # createDataFrame over local rows (an ExistingRDD scan by
    # construction) — the assertion still proves the OPERATORS add no
    # cartesian, row-UDF, or global-window stage on top

    def test_tag_profiles_plan_clean(self, spark, users_df, golden_rules):
        from bigdata_tag_system_spark.operators.tagging import TagEngine

        eng = TagEngine(golden_rules)
        assert_scalable(eng.profiles(users_df), allow=["rdd_scan"])

    def test_dedup_and_text_plans_clean(self, spark):
        from bigdata_tag_system_spark.operators.dedup import minhash_dedup
        from bigdata_tag_system_spark.operators.text import tfidf_top_terms

        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma {i} delta epsilon") for i in range(30)],
            "doc_id long, text string")
        assert_scalable(minhash_dedup(docs, threshold=0.5), allow=["rdd_scan"])
        assert_scalable(tfidf_top_terms(docs, k=2), allow=["rdd_scan"])

    def test_parquet_backed_flagship_fully_clean(self, spark, sf_dir):
        # over real parquet there is no fixture artifact: the flagship
        # profile plan must be hazard-free with NO allowances
        import __spark_entry__ as entry

        assert_scalable(entry.queries()["tag_profiles"](spark, sf_dir))
