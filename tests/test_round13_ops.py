"""Round-13 tests: the r12 ADVICE-fix regressions (lease-reclaim
marker serialization, NULL propagation through every z-score twin,
heaps_fit floor-division bucketing, hard-negative duplicate-term
dedupe, zone-map physical-type validation) plus the r13 additions."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


class TestLeaseReclaimMarker:
    """versioned.write_version stale-lease reclaim (r12 ADVICE #1):
    reclaim is serialized through an O_EXCL `.reclaim` marker so two
    writers can never both pass the staleness check and have the
    second unlink a lease the first just re-claimed."""

    def _make_stale_lease(self, tmp_path, n=1, age=7200.0):
        from bigdata_tag_system_spark.sources.versioned import _lease_path

        path = str(tmp_path / "store")
        os.makedirs(path, exist_ok=True)
        lease = _lease_path(path, n)
        with open(lease, "w") as f:
            f.write("99999:dead")
        old = time.time() - age
        os.utime(lease, (old, old))
        return path, lease

    def test_stale_lease_is_reclaimed_and_write_succeeds(
            self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.versioned import (
            read_version, write_version,
        )

        path, lease = self._make_stale_lease(tmp_path)
        n = write_version(spark.range(3), path)
        assert n == 1
        assert read_version(spark, path).count() == 3
        assert not os.path.exists(lease)
        assert not os.path.exists(lease + ".reclaim")

    def test_fresh_reclaim_marker_blocks_second_reclaimer(
            self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.versioned import (
            write_version,
        )

        path, lease = self._make_stale_lease(tmp_path)
        with open(lease + ".reclaim", "w"):
            pass  # another writer is mid-reclaim (fresh marker)
        with pytest.raises(RuntimeError, match="reclaiming"):
            write_version(spark.range(3), path)
        # the blocked writer must NOT have removed the stale lease or
        # the other writer's marker
        assert os.path.exists(lease)
        assert os.path.exists(lease + ".reclaim")

    def test_stale_marker_from_crashed_reclaimer_is_cleared(
            self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.versioned import (
            write_version,
        )

        path, lease = self._make_stale_lease(tmp_path)
        marker = lease + ".reclaim"
        with open(marker, "w"):
            pass
        old = time.time() - 7200.0
        os.utime(marker, (old, old))  # reclaimer crashed long ago
        n = write_version(spark.range(2), path)
        assert n == 1
        assert not os.path.exists(marker)

    def test_lease_refreshed_under_marker_is_not_removed(
            self, spark, tmp_path):
        """A lease that turns FRESH between the stat and the marker
        claim (someone re-claimed it) fails the under-marker re-check:
        the reclaimer backs off without unlinking the live lease."""
        from bigdata_tag_system_spark.sources import versioned as V

        path, lease = self._make_stale_lease(tmp_path)
        real_open = os.open
        state = {"armed": True}

        def intercept(p, flags, *a, **kw):
            if state["armed"] and p.endswith(".reclaim"):
                # simulate the race: the "dead" writer's lease comes
                # alive the instant we win the reclaim marker
                state["armed"] = False
                os.utime(lease, None)
            return real_open(p, flags, *a, **kw)

        os.open = intercept
        try:
            with pytest.raises(RuntimeError, match="re-claimed"):
                V.write_version(spark.range(2), path)
        finally:
            os.open = real_open
        assert os.path.exists(lease)  # the live lease survived


class TestZscoreNullPropagation:
    """r12 ADVICE #2: a NULL value z-scores to NULL in every group
    shape and every twin — degenerate groups must not 0.0-fill the
    null slots (pc.stddev/stddev_samp skip nulls, so a 2-row group
    with 1 non-null is degenerate yet still holds a null row)."""

    def _df(self, spark):
        return spark.createDataFrame(
            [("d", 1, 10.0), ("d", 2, None),    # degenerate w/ null
             ("n", 3, 10.0), ("n", 4, 20.0), ("n", 5, None),
             ("z", 6, None), ("z", 7, None)],   # all-null group
            "user_id string, event_id int, value double")

    def test_all_three_twins_agree_on_nulls(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            normalize_per_user, normalize_per_user_arrow,
            normalize_per_user_pandas,
        )

        def z(out):
            return {r["event_id"]: r["value_z"] for r in out.collect()}

        df = self._df(spark)
        zw, za, zp = (z(f(df)) for f in (
            normalize_per_user, normalize_per_user_arrow,
            normalize_per_user_pandas))
        for got in (zw, za, zp):
            assert got[1] == 0.0          # degenerate valid row
            assert got[2] is None         # degenerate null row
            assert got[3] == pytest.approx(-0.7071067811865475)
            assert got[4] == pytest.approx(0.7071067811865475)
            assert got[5] is None         # non-degenerate null row
            assert got[6] is None and got[7] is None

    def test_non_null_behavior_unchanged(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            normalize_per_user, normalize_per_user_arrow,
        )

        df = spark.createDataFrame(
            [("u", 1, 5.0), ("u", 2, 5.0), ("s", 3, 1.0)],
            "user_id string, event_id int, value double")
        for f in (normalize_per_user, normalize_per_user_arrow):
            got = {r["event_id"]: r["value_z"] for r in f(df).collect()}
            assert got == {1: 0.0, 2: 0.0, 3: 0.0}


class TestHeapsFloorDivision:
    """r12 ADVICE #3: bucket = floor(doc_id / bucket_docs), so
    negative ids bucket identically to the oracle's `//`."""

    def test_negative_ids_bucket_by_floor(self, spark):
        from bigdata_tag_system_spark.operators.text import heaps_fit

        # ids -3..2, bucket_docs=2: floor buckets {-2,-1,0,1} (4); a
        # truncate-toward-zero cast folds -3 into -1's bucket and -1
        # into 0's, leaving only {-1,0,1} (3)
        rows = [(i, f"tok{i} common") for i in range(-3, 3)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        r = heaps_fit(df, bucket_docs=2, gram_n=1).collect()[0]
        assert r["n_points"] == 4

    def test_negative_ids_match_python_floor_replay(self, spark):
        from bigdata_tag_system_spark.operators.text import heaps_fit
        import math

        rows = [(-5, "a b"), (-1, "a c"), (0, "d"), (3, "e f g")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = heaps_fit(df, bucket_docs=3, gram_n=1).collect()[0]

        # python replay with true floor division
        docs = {-5: ["a", "b"], -1: ["a", "c"], 0: ["d"],
                3: ["e", "f", "g"]}
        buckets = sorted({d // 3 for d in docs})
        seen, first_bucket = set(), {}
        for d in sorted(docs):
            for t in docs[d]:
                if t not in seen:
                    seen.add(t)
                    first_bucket[t] = d // 3
        pts, ct, cv = [], 0, 0
        for b in buckets:
            ct += sum(len(v) for d, v in docs.items() if d // 3 == b)
            cv += sum(1 for t, fb in first_bucket.items() if fb == b)
            if ct > 0 and cv > 0:
                pts.append((math.log(ct), math.log(cv)))
        assert got["n_points"] == len(pts)


class TestHardNegativeTermDedupe:
    """r12 ADVICE #4: repeated terms within one query's list must not
    double-count that term's BM25 contribution."""

    def _docs(self, spark):
        rows = [(1, "apple banana cherry"), (2, "apple apple date"),
                (3, "banana banana banana"), (4, "cherry date egg"),
                (5, "apple banana")]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_duplicate_terms_score_like_deduped(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            hard_negative_mining,
        )

        docs = self._docs(spark)
        dup = hard_negative_mining(
            docs, {"q": ["apple", "apple", "banana"]}, {"q": [5]}, k=3)
        ded = hard_negative_mining(
            docs, {"q": ["apple", "banana"]}, {"q": [5]}, k=3)
        a = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
             for r in dup.collect()}
        b = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
             for r in ded.collect()}
        assert set(a) == set(b)
        for k in a:
            assert a[k][0] == b[k][0]
            assert a[k][1] == pytest.approx(b[k][1], rel=1e-12)

    def test_duplicate_terms_match_bm25_topk(self, spark):
        from bigdata_tag_system_spark.operators.text import (
            bm25_topk, hard_negative_mining,
        )

        docs = self._docs(spark)
        hn = {r["doc_id"]: r["score"] for r in hard_negative_mining(
            docs, {"q": ["apple", "apple"]}, {}, k=5).collect()}
        bm = {r["doc_id"]: r["score"] for r in
              bm25_topk(docs, ["apple"], k=5).collect()}
        assert set(hn) == set(bm)
        for d in hn:
            assert hn[d] == pytest.approx(bm[d], rel=1e-12)


class TestZoneMapTypeValidation:
    """r12 ADVICE #5: zone_map_report enforces an integer parquet
    physical type up front and names the local-FS listing constraint
    in its errors."""

    def test_string_zone_column_rejected(self, spark, tmp_path):
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        path = str(tmp_path / "zstr")
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "bucket int, k string"
        ).write.partitionBy("bucket").parquet(path)
        with pytest.raises(ValueError, match="physical type"):
            zone_map_report(spark, path, "k", lo=0, hi=1)

    def test_missing_zone_column_rejected(self, spark, tmp_path):
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        path = str(tmp_path / "zmiss")
        spark.createDataFrame(
            [(1, 10)], "bucket int, k int"
        ).write.partitionBy("bucket").parquet(path)
        with pytest.raises(ValueError, match="not in parquet schema"):
            zone_map_report(spark, path, "nope", lo=0, hi=1)

    def test_empty_dir_error_names_local_fs_constraint(
            self, spark, tmp_path):
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        path = str(tmp_path / "zempty")
        os.makedirs(path)
        with pytest.raises(ValueError, match="LOCAL filesystem"):
            zone_map_report(spark, path, "k", lo=0, hi=1)

    def test_integer_zone_column_still_works(self, spark, tmp_path):
        from bigdata_tag_system_spark.operators.layout import (
            zone_map_report,
        )

        path = str(tmp_path / "zint")
        spark.createDataFrame(
            [(0, 1), (0, 5), (1, 100), (1, 200)], "bucket int, k int"
        ).write.partitionBy("bucket").parquet(path)
        got = {r["bucket"]: (r["zone_min"], r["zone_max"], r["skip"])
               for r in zone_map_report(
                   spark, path, "k", lo=0, hi=10).collect()}
        assert got == {0: (1, 5, 0), 1: (100, 200, 1)}


class TestMlInteropMinhash:
    """r13: the MLlib MinHashLSH pipeline must reproduce the
    hand-rolled verified pair set exactly — sets AND Jaccard values
    (both sides compute the same rational over the same
    distinct-shingle sets)."""

    def test_pair_set_and_values_match_hand_rolled(self, spark, sf_dir):
        from bigdata_tag_system_spark.operators import dedup as D
        from bigdata_tag_system_spark.operators.ml_interop import (
            minhash_lsh_ml_pairs,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        ml = {(r["id_a"], r["id_b"]): r["ml_jaccard"]
              for r in minhash_lsh_ml_pairs(docs, threshold=0.5).collect()}
        ours = {(r["id_a"], r["id_b"]): r["jaccard"]
                for r in D.minhash_dedup(docs, threshold=0.5).collect()}
        assert len(ml) > 0
        assert set(ml) == set(ours)
        for k in ml:
            assert ml[k] == ours[k]  # exact, not approx — same rational

    def test_threshold_boundary_pair_is_kept(self, spark):
        # two docs with Jaccard exactly 0.5 (6 shared of 12 union
        # shingles): approxSimilarityJoin's strict dist<th filter would
        # drop it without the +1e-7 epsilon
        from bigdata_tag_system_spark.operators.ml_interop import (
            minhash_lsh_ml_pairs,
        )

        # 11 tokens each, 9 distinct 3-shingles, 6 shared (the common
        # 8-token prefix): J = 6/12 = 0.5 exactly. (Brute-force truth,
        # not the banded twin: at j exactly 0.5 the hand-rolled r=4
        # banding's recall is only ~0.65 and can deterministically
        # miss — the catalog entry pins parity at the corpus's j≥0.8
        # floor where both sides recall 1.0.)
        common = "alpha beta gamma delta epsilon zeta eta theta"
        a = common + " iota kappa lambda"
        b = common + " mu nu xi"
        df = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string")
        got = minhash_lsh_ml_pairs(df, threshold=0.5).collect()
        assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
        assert got[0]["ml_jaccard"] == 0.5


class TestMlInteropQuantile:
    """r13: QuantileDiscretizer(relativeError=0.0) assignment is
    pinned row-level equal to the percentile_disc fence twin."""

    def test_row_level_parity_with_ties(self, spark):
        from pyspark.sql import functions as F
        from bigdata_tag_system_spark.operators.ml_interop import (
            quantile_bucket_ml, quantile_bucket_native,
        )

        import random
        random.seed(13)
        vals = ([round(random.uniform(0, 100), 2) for _ in range(500)]
                + [42.0] * 77 + [None] * 5)
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v double")
        m = {r["id"]: r["bucket"]
             for r in quantile_bucket_ml(df, "v").collect()}
        n = {r["id"]: r["bucket"]
             for r in quantile_bucket_native(df, "v").collect()}
        assert m == n and len(m) == 577  # nulls dropped on both sides

    def test_duplicate_fences_collapse_identically(self, spark):
        # 90% identical values: most decile fences coincide, Bucketizer
        # dedupes splits — the native count-of-distinct-fences twin
        # must land in the same merged buckets
        from bigdata_tag_system_spark.operators.ml_interop import (
            quantile_bucket_ml, quantile_bucket_native,
        )

        vals = [5.0] * 90 + [float(i) for i in range(10)]
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vals)], "id long, v double")
        m = {r["id"]: r["bucket"]
             for r in quantile_bucket_ml(df, "v").collect()}
        n = {r["id"]: r["bucket"]
             for r in quantile_bucket_native(df, "v").collect()}
        assert m == n

    def test_bucket_counts_are_deciles(self, spark):
        from pyspark.sql import functions as F
        from bigdata_tag_system_spark.operators.ml_interop import (
            quantile_bucket_ml,
        )

        df = spark.range(1000).select(
            F.col("id"), (F.col("id") * 7 % 1000).cast("double").alias("v"))
        out = quantile_bucket_ml(df, "v")
        counts = {r["bucket"]: r["count"] for r in
                  out.groupBy("bucket").count().collect()}
        assert set(counts) == set(range(10))
        assert all(abs(c - 100) <= 1 for c in counts.values())


class TestCorpusBuildPlan:
    """r13: the end-to-end corpus build — scrub → decontaminate →
    allocate → select → account, every stage's arithmetic checked."""

    def _frames(self, spark):
        # 3 sources; src_a carries an exact dup pair (11/12); doc 20
        # is a verbatim copy of benchmark doc 1 (contamination); token
        # masses differ so the temperature allocation is non-trivial
        corpus = spark.createDataFrame(
            [(10, "alpha beta gamma delta epsilon zeta eta theta iota",
              "src_a"),
             (11, "one two three four five six seven eight nine ten",
              "src_a"),
             (12, "one two three four five six seven eight nine ten",
              "src_a"),                      # exact dup of 11
             (20, "the quick brown fox jumps over the lazy dog today",
              "src_b"),                      # == benchmark doc 1
             (21, "lorem ipsum dolor sit amet consectetur adipiscing",
              "src_b"),
             (30, "spark scale shuffle partition broadcast join agg",
              "src_c"),
             (31, "window frame row range partition order current",
              "src_c"),
             (32, "stream state watermark trigger sink source batch",
              "src_c")],
            "doc_id long, text string, source string")
        bench = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog today")],
            "doc_id long, text string")
        return corpus, bench

    def test_ledger_arithmetic(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            corpus_build_plan,
        )

        corpus, bench = self._frames(spark)
        out = {r["source"]: r.asDict() for r in corpus_build_plan(
            corpus, bench, token_budget=30, alpha=0.5,
            contamination_ngram=8, min_overlap=1).collect()}
        assert set(out) == {"src_a", "src_b", "src_c"}
        a, b, c = out["src_a"], out["src_b"], out["src_c"]
        # scrub: the 11/12 dup pair loses one doc in src_a only
        assert a["n_exact_dups"] == 1
        assert b["n_exact_dups"] == c["n_exact_dups"] == 0
        # decontaminate: doc 20 (verbatim benchmark copy) drops
        assert b["n_contaminated"] == 1
        assert a["n_contaminated"] == c["n_contaminated"] == 0
        assert b["docs_avail"] == 1
        # allocate: Hamilton sums to the budget exactly
        assert sum(r["alloc_tokens"] for r in out.values()) == 30
        # select: strict budgets, never exceeded
        for r in out.values():
            assert r["picked_tokens"] <= r["alloc_tokens"]
            assert 0 <= r["fill_bp"] <= 10000

    def test_dup_loser_is_never_picked(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            corpus_build_plan,
        )

        corpus, bench = self._frames(spark)
        out = {r["source"]: r for r in corpus_build_plan(
            corpus, bench, token_budget=1000, alpha=0.5,
            contamination_ngram=8, min_overlap=1).collect()}
        # budget >> corpus: every available doc is picked; src_a's
        # id-sum must include winner 11, never loser 12
        a = out["src_a"]
        assert a["picked_docs"] == a["docs_avail"] == 2
        assert a["picked_id_sum"] == 10 + 11

    def test_budget_validation(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            corpus_build_plan,
        )

        corpus, bench = self._frames(spark)
        with pytest.raises(ValueError, match="token_budget"):
            corpus_build_plan(corpus, bench, token_budget=0)

    def test_allocation_favors_big_sources_sublinearly(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            allocate_by_temperature,
        )

        counts = spark.createDataFrame(
            [("big", 10000), ("small", 100)], "grp string, n_docs long")
        got = {r["grp"]: r["alloc"] for r in allocate_by_temperature(
            counts, 1000, alpha=0.5).collect()}
        assert got["big"] + got["small"] == 1000
        # proportional would give small ~10; sqrt temp gives ~91
        assert got["small"] > 50

    def test_temperature_allocation_unchanged_by_refactor(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            temperature_allocation,
        )

        df = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(90)], "id long, src string")
        out = {r["grp"]: r["alloc"]
               for r in temperature_allocation(df, "src", 30).collect()}
        assert sum(out.values()) == 30 and set(out) == {"s0", "s1", "s2"}

    def test_string_id_rejected(self, spark):
        from bigdata_tag_system_spark.operators.sampling import (
            corpus_build_plan,
        )

        corpus = spark.createDataFrame(
            [("a", "x y z", "s1")], "doc_id string, text string, source string")
        bench = spark.createDataFrame(
            [(1, "q")], "doc_id long, text string")
        with pytest.raises(ValueError, match="integral"):
            corpus_build_plan(corpus, bench, token_budget=10)


class TestLitDoubleArray:
    """r13 optimization: literal array<double> built via ONE SQL-parsed
    expression instead of one py4j lit() per element (guide §5 — driver
    time). Must be bit-exact with the per-element path."""

    def test_bit_exact_roundtrip(self, spark):
        from bigdata_tag_system_spark.functions.arrays import (
            lit_double_array,
        )

        vals = [0.1, -1e-17, 2.5e300, 1 / 3, -0.0, 7.0, 1e-320]
        row = spark.range(1).select(
            lit_double_array(vals).alias("a"),
            F.array(*[F.lit(float(x)) for x in vals]).alias("b")).first()
        assert row["a"] == row["b"]
        assert all(x == y for x, y in zip(row["a"], vals))

    def test_srp_signature_unchanged(self, spark):
        # the heaviest consumer: the 24-plane SRP signature fold must
        # produce the identical bigint per row as the old per-element
        # literal build (same planes, same fold order)
        from bigdata_tag_system_spark.operators.embeddings import (
            srp_hyperplanes, srp_signature,
        )

        planes = srp_hyperplanes(dim=8, n_bits=12, seed=7)
        df = spark.createDataFrame(
            [(i, [float((i * 7 + j) % 5) - 2.0 for j in range(8)])
             for i in range(20)],
            "vec_id long, embedding array<double>")
        got = df.select(srp_signature("embedding", planes).alias("s")) \
            .collect()
        # replay per-element path inline
        old_sig = F.lit(0).cast("bigint")
        v = F.col("embedding").cast("array<double>")
        for j, h in enumerate(planes):
            dot = F.aggregate(
                F.zip_with(v, F.array(*[F.lit(x) for x in h]),
                           lambda a, b: a * b),
                F.lit(0.0), lambda acc, x: acc + x)
            old_sig = old_sig + F.when(dot >= 0, F.lit(1 << j)) \
                .otherwise(F.lit(0))
        want = df.select(old_sig.alias("s")).collect()
        assert got == want

    def test_nonfinite_and_empty_fallback(self, spark):
        from bigdata_tag_system_spark.functions.arrays import (
            lit_double_array,
        )

        row = spark.range(1).select(
            lit_double_array([]).alias("e"),
            lit_double_array([float("inf"), 1.0]).alias("nf")).first()
        assert row["e"] == []
        assert row["nf"][0] == float("inf") and row["nf"][1] == 1.0
