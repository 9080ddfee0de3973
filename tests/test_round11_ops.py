"""Round-11 tests: ADVICE-fix regressions (NULL semantics in
cumulative_distinct_count and arrow_batch_norms, the heartbeat lease in
the versioned store's GC, the explicit label_col contract) and the
shared exact-pass memo for the label-noise pair."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


class TestCumDistinctNulls:
    def test_null_values_do_not_count(self, spark):
        # SQL COUNT(DISTINCT x) OVER ignores NULLs; the first-occurrence
        # flag must be zeroed for NULL values (ADVICE r10, medium)
        from bigdata_tag_system_spark.operators.features import (
            cumulative_distinct_count,
        )

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "b"), (4, None), (5, "a")],
            "seq int, v string")
        out = {r["seq"]: r["cum_distinct"] for r in
               cumulative_distinct_count(
                   df, "v", "seq", "seq").collect()}
        # NULL at seq=2 and seq=4 must not bump the running count
        assert out == {1: 1, 2: 1, 3: 2, 4: 2, 5: 2}

    def test_all_null_partition_counts_zero(self, spark):
        from bigdata_tag_system_spark.operators.features import (
            cumulative_distinct_count,
        )

        df = spark.createDataFrame(
            [(1, None), (2, None)], "seq int, v string")
        out = [r["cum_distinct"] for r in
               cumulative_distinct_count(
                   df, "v", "seq", "seq").orderBy("seq").collect()]
        assert out == [0, 0]


class TestArrowNormsNullSlots:
    def test_null_vector_does_not_misalign_following_rows(self, spark):
        # pa.ListArray.flatten() omits values under null slots while raw
        # offsets keep advancing — the segmented reduction must key on
        # value_lengths()/validity, or every row after a null gets the
        # wrong segment (ADVICE r10, low). Null vectors emit NULL.
        from bigdata_tag_system_spark.operators.embeddings import (
            arrow_batch_norms,
        )

        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, None), (3, [6.0, 8.0]), (4, []),
             (5, [5.0, 12.0])],
            "vec_id long, embedding array<double>")
        # single partition => one RecordBatch containing the null slot
        # mid-batch, the misalignment-triggering layout
        out = {r["vec_id"]: r["norm9"] for r in
               arrow_batch_norms(df.coalesce(1)).collect()}
        assert out[1] == 5.0
        assert out[2] is None
        assert out[3] == 10.0
        assert out[4] == 0.0
        assert out[5] == 13.0

    def test_matches_sql_fold_under_nulls(self, spark):
        from bigdata_tag_system_spark.operators.embeddings import (
            arrow_batch_norms,
        )

        df = spark.createDataFrame(
            [(i, None if i % 7 == 0 else
              [((i * 31 + j) % 13) / 3.0 for j in range(8)])
             for i in range(1, 60)],
            "vec_id long, embedding array<double>")
        got = {r["vec_id"]: r["norm9"]
               for r in arrow_batch_norms(df.repartition(3)).collect()}
        want = {r["vec_id"]: r["norm9"] for r in df.select(
            "vec_id",
            (F.floor(F.sqrt(F.aggregate(
                "embedding", F.lit(0.0), lambda a, x: a + x * x))
                * 1e9 + F.lit(0.5)) / 1e9).alias("norm9")).collect()}
        assert got == want


class TestGcHeartbeatLease:
    def test_fresh_lease_spares_slot_despite_old_mtimes(
            self, spark, tmp_path):
        # the ADVICE r10 scenario: a live writer created v{n} long ago
        # (its job is stuck in upstream stages; every file mtime is
        # stale) but its heartbeat lease is fresh — GC must spare it
        from bigdata_tag_system_spark.sources.versioned import (
            _lease_path, gc_orphans, write_version,
        )

        path = str(tmp_path / "store")
        write_version(spark.range(3), path)
        orphan = os.path.join(path, "v2")
        os.makedirs(orphan)
        with open(os.path.join(orphan, "part-stale"), "w") as f:
            f.write("x")
        old = time.time() - 7200
        os.utime(os.path.join(orphan, "part-stale"), (old, old))
        os.utime(orphan, (old, old))
        with open(_lease_path(path, 2), "w") as f:
            f.write("pid")
        assert gc_orphans(path, min_age_seconds=3600) == []
        assert os.path.isdir(orphan)

    def test_stale_lease_reclaims_slot_and_lease(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.versioned import (
            _lease_path, gc_orphans, write_version,
        )

        path = str(tmp_path / "store")
        write_version(spark.range(3), path)
        orphan = os.path.join(path, "v2")
        os.makedirs(orphan)
        lease = _lease_path(path, 2)
        with open(lease, "w") as f:
            f.write("pid")
        old = time.time() - 7200
        os.utime(lease, (old, old))
        assert gc_orphans(path, min_age_seconds=3600) == ["v2"]
        assert not os.path.exists(orphan)
        assert not os.path.exists(lease)

    def test_write_version_cleans_its_lease(self, spark, tmp_path):
        from bigdata_tag_system_spark.sources.versioned import (
            _lease_path, write_version,
        )

        path = str(tmp_path / "store")
        n = write_version(spark.range(3), path)
        assert n == 1
        assert not os.path.exists(_lease_path(path, 1))
        # and the slot is named, so GC has nothing to do either way

    def test_no_lease_falls_back_to_mtime_age(self, spark, tmp_path):
        # foreign/failed writers leave no lease: the age heuristic
        # still reclaims old orphans and spares young ones
        from bigdata_tag_system_spark.sources.versioned import (
            gc_orphans, write_version,
        )

        path = str(tmp_path / "store")
        write_version(spark.range(3), path)
        orphan = os.path.join(path, "v2")
        os.makedirs(orphan)
        assert gc_orphans(path, min_age_seconds=3600) == []  # young
        old = time.time() - 7200
        os.utime(orphan, (old, old))
        assert gc_orphans(path, min_age_seconds=3600) == ["v2"]


class TestLabelNoiseSharedExactPass:
    def _corpus(self, spark):
        rows = []
        for i in range(6):
            rows.append((i, [1.0, 0.01 * i], "x"))
        for i in range(6, 12):
            rows.append((i, [0.01 * (i - 6), 1.0], "y"))
        rows.append((12, [1.0, 0.05], "y"))  # planted mislabel
        return spark.createDataFrame(
            rows, "vec_id int, embedding array<double>, label string")

    def test_per_vec_memo_reproduces_both_consumers(self, spark):
        # the r11 memo contract: the census fed a precomputed per-vec
        # relation equals the census that derives it itself, and the
        # probe audit fed exact_per_vec equals the self-deriving audit
        from bigdata_tag_system_spark.operators.embeddings import (
            label_noise_per_vec, label_noise_probe_audit,
            label_noise_report,
        )

        df = self._corpus(spark)
        cents = [[1.0, 0.0], [0.0, 1.0]]
        pv = label_noise_per_vec(df, cents, k=3)

        direct = label_noise_report(
            df, k=3, centroids=cents, nprobe=2).collect()
        via_memo = label_noise_report(df, k=3, per_vec=pv).collect()
        assert sorted(map(tuple, direct)) == sorted(map(tuple, via_memo))

        a_direct = label_noise_probe_audit(
            df, cents, k=3, nprobe=1).collect()
        a_memo = label_noise_probe_audit(
            df, cents, k=3, nprobe=1, exact_per_vec=pv).collect()
        assert sorted(map(tuple, a_direct)) == sorted(map(tuple, a_memo))

    def test_exact_relation_is_centroid_independent(self, spark):
        # full probe only prunes, so ANY bucketing yields the same
        # exact per-vec mismatch relation — the property that makes the
        # memo shareable between entries using different anchors
        from bigdata_tag_system_spark.operators.embeddings import (
            label_noise_per_vec,
        )

        df = self._corpus(spark)
        a = label_noise_per_vec(
            df, [[1.0, 0.0], [0.0, 1.0]], k=3).collect()
        b = label_noise_per_vec(
            df, [[0.7, 0.7], [1.0, 0.1], [0.1, 1.0]], k=3).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
