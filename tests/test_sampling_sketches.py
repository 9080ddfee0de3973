"""Sampling/split determinism, sketch tolerance, TF-IDF, and packing
invariants. These back the oracle rows (`sample_*`, `sketch_*`,
`text_tfidf_top_terms`) and carry the full verification burden for the
oracle-less greedy packer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdata_tag_system_spark.operators.sampling import (
    knuth_hash,
    sample_fraction,
    stratified_sample,
    topk_per_stratum,
    train_test_split,
)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(1, 2001)],
        "id long, segment string",
    ).cache()


class TestSampling:
    def test_fraction_accuracy_and_key_stability(self, people):
        s = sample_fraction(people, 0.3, "id", salt=1)
        n = s.count()
        assert abs(n - 600) < 60  # ±10% at n=2000
        # key-stable: same rows kept on re-run and after repartitioning
        again = set(r["id"] for r in
                    sample_fraction(people.repartition(7), 0.3, "id", salt=1)
                    .select("id").collect())
        assert set(r["id"] for r in s.select("id").collect()) == again
        # different salt → different (but same-sized-ish) sample
        other = set(r["id"] for r in
                    sample_fraction(people, 0.3, "id", salt=2)
                    .select("id").collect())
        assert other != again

    def test_stratified_rates(self, people):
        out = stratified_sample(
            people, "segment", {"a": 0.6, "b": 0.1}, key_col="id", salt=5)
        counts = {r["segment"]: r["n"] for r in
                  out.groupBy("segment").agg(F.count("*").alias("n")).collect()}
        assert abs(counts["a"] - 0.6 * 667) < 70
        assert abs(counts["b"] - 0.1 * 667) < 35
        assert "c" not in counts  # default fraction 0

    def test_split_partitions_everything_disjointly(self, people):
        out = train_test_split(people, "id", weights=(0.75, 0.125, 0.125),
                               salt=9).cache()
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 2000  # total coverage
        assert set(counts) == {"train", "validation", "test"}
        assert abs(counts["train"] - 1500) < 100
        # a key appears in exactly one split (no leakage)
        assert out.select("id", "split").distinct().count() == 2000
        out.unpersist()

    def test_portable_hash_matches_duckdb(self, people):
        import duckdb

        rows = [(r["id"],) for r in people.select("id").collect()]
        con = duckdb.connect()
        con.execute("CREATE TABLE t (id BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", rows)
        want = {r[0] for r in con.execute(
            "SELECT id FROM t WHERE "
            "(((id + 4) % 2147483648) * 2654435761) % 4294967296 "
            "< 1288490188").fetchall()}  # int(0.3 * 2^32)
        got = {r["id"] for r in
               people.where(knuth_hash("id", 4) < 1288490188).collect()}
        assert got == want

    def test_topk_per_stratum_exact_n(self, people):
        out = topk_per_stratum(people, "segment", n=7, key_col="id")
        counts = {r["segment"]: r["n"] for r in
                  out.groupBy("segment").agg(F.count("*").alias("n")).collect()}
        assert counts == {"a": 7, "b": 7, "c": 7}

    def test_split_weight_validation(self, people):
        with pytest.raises(ValueError, match="weights"):
            train_test_split(people, "id", weights=(1.0,), names=("a", "b"))

    def test_portable_rejects_non_integral_keys(self, spark):
        # cast('long') on a string key would NULL every hash and dump all
        # rows into the default branch — must refuse loudly instead
        df = spark.createDataFrame([("doc-a",), ("doc-b",)], "id string")
        with pytest.raises(ValueError, match="integral"):
            train_test_split(df, "id", portable=True)
        # the xxhash64 default handles any key type
        out = train_test_split(df, "id")
        assert {r["split"] for r in out.collect()} <= {"train", "validation", "test"}

    def test_portable_hash_survives_snowflake_ids(self, spark):
        import duckdb

        # ids past 2^31: the pre-reduced hash must stay in-range and
        # byte-match DuckDB (the unreduced multiply overflows int64)
        big = [(2**31 + 5,), (10**18,), (2**62,)]
        df = spark.createDataFrame(big, "id long")
        got = {r["id"]: r["h"] for r in
               df.select("id", knuth_hash("id", 4).alias("h")).collect()}
        con = duckdb.connect()
        for (i,) in big:
            want = con.execute(
                f"SELECT ((({i} + 4) % 2147483648) * 2654435761) "
                f"% 4294967296").fetchone()[0]
            assert got[i] == want


class TestSketches:
    def test_iqr_outlier_filter(self, spark):
        from bigdata_tag_system_spark.operators.sketches import (
            filter_outliers_iqr,
            iqr_bounds,
        )

        # values 1..100 plus extreme outliers and a NULL
        rows = [(i, float(i)) for i in range(1, 101)]
        rows += [(200, 10_000.0), (201, -10_000.0), (202, None)]
        df = spark.createDataFrame(rows, "id long, v double")
        b = iqr_bounds(df, "v").collect()[0]
        assert b["q1"] < b["q3"] and b["lo"] < b["q1"] and b["hi"] > b["q3"]
        kept = {r["id"] for r in filter_outliers_iqr(df, "v").collect()}
        assert 200 not in kept and 201 not in kept and 202 not in kept
        assert set(range(1, 101)) <= kept
        with_nulls = {r["id"] for r in
                      filter_outliers_iqr(df, "v", keep_nulls=True).collect()}
        assert with_nulls == kept | {202}

    def test_distinct_and_quantiles_within_tolerance(self, spark, people):
        from bigdata_tag_system_spark.operators.sketches import (
            distinct_count_check,
            quantile_check,
        )

        row = distinct_count_check(people, "id", rsd=0.02).collect()[0]
        assert row["exact_cnt"] == 2000 and row["within_tolerance"]

        vals = people.select((F.col("id") * 1.5).alias("v"))
        rows = quantile_check(vals, "v", (0.5, 0.9), 0.01).collect()
        assert [r["p"] for r in rows] == [0.5, 0.9]
        assert all(r["within_tolerance"] for r in rows)
        # interpolated median of 1.5 * (1..2000) = 1.5 * 1000.5
        assert rows[0]["exact_value"] == pytest.approx(1500.75)

    def test_frequent_items_guarantee_under_truncation(self, spark):
        from bigdata_tag_system_spark.operators.sketches import frequent_items_check

        # hot items spread thin across partitions + a flood of uniques
        # per partition so capacity-4 summaries MUST truncate; the hot
        # items still have to surface in the merged sketch
        rows = [("hot_a",)] * 120 + [("hot_b",)] * 80 + [("hot_c",)] * 50
        rows += [(f"unique_{i}",) for i in range(400)]
        df = spark.createDataFrame(rows, "v string").repartition(16)
        out = frequent_items_check(df, "v", k=3, capacity=4).collect()
        assert [r["item"] for r in out] == ["hot_a", "hot_b", "hot_c"]
        assert [r["exact_cnt"] for r in out] == [120, 80, 50]
        assert all(r["ok"] for r in out)

    def test_frequent_items_rejects_bad_capacity(self, spark):
        from bigdata_tag_system_spark.operators.sketches import frequent_items_check

        df = spark.createDataFrame([("x",)], "v string")
        with pytest.raises(ValueError):
            frequent_items_check(df, "v", capacity=0)


class TestTfidf:
    def test_hand_computed_example(self, spark):
        import math

        from bigdata_tag_system_spark.operators.text import tfidf_top_terms

        docs = spark.createDataFrame(
            [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")],
            "doc_id long, text string")
        out = {(r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
               for r in tfidf_top_terms(docs, k=2).collect()}
        # doc 1: apple tf=2 df=1 → 2·ln3 ; banana tf=1 df=2 → ln1.5
        assert out[(1, 1)][0] == "apple"
        assert out[(1, 1)][1] == pytest.approx(2 * math.log(3.0))
        assert out[(1, 2)][0] == "banana"
        assert out[(1, 2)][1] == pytest.approx(math.log(1.5))
        # doc 3: date is rarer (df=1) than cherry (df=2) → ranks first
        assert out[(3, 1)][0] == "date"
        assert out[(3, 1)][1] == pytest.approx(math.log(3.0))
        assert out[(3, 2)][0] == "cherry"
        # doc 2 is a true tie (both tf=1, df=2) → term-order tiebreak
        assert out[(2, 1)][0] == "banana" and out[(2, 2)][0] == "cherry"


class TestPacking:
    def test_greedy_invariants(self, spark):
        from bigdata_tag_system_spark.operators.features import pack_by_token_budget

        docs = spark.createDataFrame(
            [(i, (i * 37) % 90 + 10) for i in range(1, 301)] + [(999, 500)],
            "doc_id long, n_tokens int")
        out = pack_by_token_budget(docs, budget=120, num_groups=4).collect()
        by_pack: dict[tuple, list] = {}
        for r in out:
            by_pack.setdefault((r["pack_group"], r["pack_id"]), []).append(r)
        for (grp, _pid), rows in by_pack.items():
            tot = sum(min(r["n_tokens"], 120) for r in rows)
            # budget respected (oversize doc counts as capped=budget,
            # so it sits alone in its pack)
            assert tot <= 120, (grp, _pid, tot)
            for r in rows:
                assert r["pack_group"] == r["doc_id"] % 4 or r["doc_id"] == 999
        # every doc packed exactly once
        assert len(out) == 301
        # oversize doc is alone
        lone = [rows for rows in by_pack.values()
                if any(r["doc_id"] == 999 for r in rows)]
        assert len(lone) == 1 and len(lone[0]) == 1
        # greedy maximality within one group: sort group 1 rows by id,
        # walking them reproduces the same boundaries
        g1 = sorted((r for r in out if r["pack_group"] == 1),
                    key=lambda r: r["doc_id"])
        used, cur = 0, 0
        for r in g1:
            tok = min(r["n_tokens"], 120)
            if used + tok > 120 and used > 0:
                cur += 1
                used = 0
            used += tok
            assert r["pack_id"] == cur, r

    def test_null_token_counts_pack_as_zero(self, spark):
        # a NULL token count must not become NaN in the pandas scan —
        # NaN poisons the running total ("used + NaN > budget" never
        # fires) and every later doc joins the current pack unbounded
        from bigdata_tag_system_spark.operators.features import pack_by_token_budget

        rows = [(1, 60), (2, None), (3, 60), (4, 60), (5, 60)]
        docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
        out = pack_by_token_budget(docs, budget=120, num_groups=1).collect()
        assert len(out) == 5
        by_pack: dict[int, int] = {}
        for r in out:
            by_pack[r["pack_id"]] = by_pack.get(r["pack_id"], 0) + (r["n_tokens"] or 0)
        # NULL counts as 0 tokens; every pack stays within budget
        assert all(tot <= 120 for tot in by_pack.values()), by_pack
        assert len(by_pack) == 2  # 60+0+60 | 60+60 — split still happens

    def test_string_ids_shard_by_hash(self, spark):
        # UUID-style ids: cast('long') would NULL every group and ship
        # the whole dataset to one task — they must hash-shard instead
        from bigdata_tag_system_spark.operators.features import pack_by_token_budget

        docs = spark.createDataFrame(
            [(f"doc-{i:04d}", 40 + i % 50) for i in range(200)],
            "doc_id string, n_tokens int")
        out = pack_by_token_budget(docs, budget=150, num_groups=4).collect()
        groups = {r["pack_group"] for r in out}
        assert None not in groups and len(groups) == 4
        assert len(out) == 200


class TestShuffleOrder:
    def test_dense_permutation_stable_under_repartition(self, spark):
        from bigdata_tag_system_spark.operators.sampling import shuffle_order

        df = spark.range(0, 500).withColumnRenamed("id", "k")
        a = {r["k"]: r["shuffle_rank"]
             for r in shuffle_order(df, "k", salt=3, portable=True).collect()}
        # dense 1..n permutation
        assert sorted(a.values()) == list(range(1, 501))
        # key-determined: repartitioning must not change any rank
        b = {r["k"]: r["shuffle_rank"]
             for r in shuffle_order(df.repartition(13), "k", salt=3,
                                    portable=True).collect()}
        assert a == b
        # a different salt is a different permutation
        c = {r["k"]: r["shuffle_rank"]
             for r in shuffle_order(df, "k", salt=4, portable=True).collect()}
        assert a != c

    def test_matches_single_window_rank(self, spark):
        from pyspark.sql import Window as W

        from bigdata_tag_system_spark.operators.sampling import (
            knuth_hash,
            shuffle_order,
        )

        df = spark.range(0, 300).withColumnRenamed("id", "k")
        got = {r["k"]: r["shuffle_rank"]
               for r in shuffle_order(df, "k", salt=9, portable=True).collect()}
        brute = {
            r["k"]: r["rn"]
            for r in df.withColumn("_h", knuth_hash("k", 9))
            .withColumn("rn", F.row_number().over(W.orderBy("_h", "k")))
            .collect()
        }
        assert got == brute


class TestWeightedAES:
    def test_selection_tilts_toward_heavy_weights(self, spark):
        from bigdata_tag_system_spark.operators.sampling import knuth_hash

        # 500 items, weights 1..500: an Efraimidis–Spirakis top-50 must
        # over-represent heavy weights — its mean weight beats the
        # population mean (~250.5) by a clear margin (deterministic
        # seed, measured 324.5 — the bound leaves headroom, not slack
        # for a broken sampler, which lands at ~250)
        df = spark.range(0, 500).select(
            F.col("id").alias("k"), (F.col("id") + 1).alias("w"))
        u = (knuth_hash(F.col("k"), salt=3) + 1) / F.lit(4294967297.0)
        picked = (
            df.select("k", "w", F.pow(u, 1.0 / F.col("w")).alias("_s"))
            .orderBy(F.desc("_s"), "k").limit(50))
        mean_sel = picked.agg(F.avg("w")).collect()[0][0]
        assert mean_sel > 250 * 1.2

    def test_without_replacement_and_deterministic(self, spark):
        from bigdata_tag_system_spark.operators.sampling import knuth_hash

        df = spark.range(0, 200).select(
            F.col("id").alias("k"), F.lit(10).alias("w"))
        u = (knuth_hash(F.col("k"), salt=3) + 1) / F.lit(4294967297.0)
        sel = (df.select("k", F.pow(u, 1.0 / F.col("w")).alias("_s"))
               .orderBy(F.desc("_s"), "k").limit(30).select("k"))
        a = sorted(r["k"] for r in sel.collect())
        b = sorted(r["k"] for r in sel.collect())
        assert a == b and len(set(a)) == 30
