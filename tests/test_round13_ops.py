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
