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


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def clear(self):
        self._v = None


class _FakeHandle:
    def __init__(self):
        self.states = {}
        self.timers = set()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def listTimers(self):
        return sorted(self.timers)

    def registerTimer(self, ts):
        self.timers.add(ts)

    def deleteTimer(self, ts):
        self.timers.discard(ts)


class _FakeGroupState:
    """Just enough of pyspark's GroupState for the old-API session fn."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


class TestTwsSessionizerParity:
    """transformWithStateInPandas needs the google.protobuf runtime
    (its state API client) which this container lacks — environmental,
    see ROADMAP. The processor LOGIC is still fully testable: drive
    SessionProcessor and the old-API session fn through identical
    micro-batch sequences via fakes and assert identical emissions,
    including the timer-close path."""

    GAP_MS = 3_600_000

    def _batches(self):
        import pandas as pd

        def mk(ts_ms, vals):
            return pd.DataFrame({
                "ts": pd.to_datetime(ts_ms, unit="ms"),
                "value": vals,
            })

        h = 3_600_000
        # batch1: two sessions' worth (gap between 2nd and 3rd event)
        b1 = mk([0, 60_000, 2 * h, 2 * h + 60_000], [1.0, 2.0, 3.0, 4.0])
        # batch2: extends the open session, then opens another
        b2 = mk([2 * h + 120_000, 5 * h], [5.0, 6.0])
        return [b1, b2]

    def _run_new(self, batches, fire_final_watermark_ms):
        from bigdata_tag_system_spark.streaming.tws import (
            SessionProcessor,
        )

        p = SessionProcessor(self.GAP_MS)
        h = _FakeHandle()
        p.init(h)
        out = []
        for b in batches:
            out.extend(p.handleInputRows(("u1",), iter([b]), None))
        for t in list(h.listTimers()):
            if t < fire_final_watermark_ms:
                h.deleteTimer(t)
                out.extend(p.handleExpiredTimer(("u1",), None, None))
        return [tuple(df.iloc[0]) for df in out]

    def _run_old(self, batches, fire_final_watermark_ms):
        from bigdata_tag_system_spark.streaming.stateful import (
            _session_fn_factory,
        )

        fn = _session_fn_factory(self.GAP_MS)
        st = _FakeGroupState()
        out = []
        for b in batches:
            out.extend(fn(("u1",), iter([b]), st))
        if (st.timeout_ts is not None
                and st.timeout_ts < fire_final_watermark_ms and st.exists):
            st.hasTimedOut = True
            out.extend(fn(("u1",), iter([]), st))
        return [tuple(df.iloc[0]) for df in out]

    def test_emissions_match_old_api_with_final_timeout(self):
        wm = 10 * 3_600_000  # final watermark passes every deadline
        new = self._run_new(self._batches(), wm)
        old = self._run_old(self._batches(), wm)
        assert new == old
        # three sessions total: [0, 60s], [2h, 2h+2m], [5h, 5h]
        assert len(new) == 3
        assert new[-1][3] == 1 and new[-1][4] == 6.0

    def test_open_session_withheld_inside_watermark(self):
        wm = 5 * 3_600_000 + 1  # deadline of the open session not passed
        new = self._run_new(self._batches(), wm)
        old = self._run_old(self._batches(), wm)
        assert new == old
        assert len(new) == 2  # the 5h session stays open

    def test_single_live_timer_per_key(self):
        from bigdata_tag_system_spark.streaming.tws import (
            SessionProcessor,
        )

        p = SessionProcessor(self.GAP_MS)
        h = _FakeHandle()
        p.init(h)
        for b in self._batches():
            list(p.handleInputRows(("u1",), iter([b]), None))
        # stale deadlines from earlier batches must have been deleted
        assert h.listTimers() == [5 * 3_600_000 + self.GAP_MS]


class TestJsonColsUdtf:
    def test_plan_time_schema_and_lenient_values(self, spark):
        from bigdata_tag_system_spark.functions.udtf_ops import (
            register_json_cols,
        )

        register_json_cols(spark)
        spark.createDataFrame(
            [(1, '{"a": 1, "b": "x", "c": [1,2], "d": true}'),
             (2, '{"a": null}'),
             (3, "not json"),
             (4, None)],
            "id long, payload string").createOrReplaceTempView("_jc")
        out = spark.sql("""
            SELECT t.id, j.a, j.b, j.c, j.d
            FROM _jc t, LATERAL json_cols(t.payload, 'a', 'b', 'c', 'd') j
            ORDER BY t.id
        """)
        # the polymorphic schema: one STRING column per literal key
        assert out.columns == ["id", "a", "b", "c", "d"]
        rows = {r["id"]: r for r in out.collect()}
        assert rows[1]["a"] == "1" and rows[1]["b"] == "x"
        assert rows[1]["c"] == "[1,2]" and rows[1]["d"] == "true"
        assert rows[2]["a"] is None           # JSON null -> NULL
        assert rows[3]["a"] is None           # malformed -> NULLs
        assert rows[4]["a"] is None           # NULL payload -> NULLs

    def test_non_literal_and_duplicate_keys_rejected(self, spark):
        from bigdata_tag_system_spark.functions.udtf_ops import (
            register_json_cols,
        )

        register_json_cols(spark)
        spark.createDataFrame(
            [(1, '{"a":1}', "a")], "id long, payload string, keycol string"
        ).createOrReplaceTempView("_jc2")
        with pytest.raises(Exception) as ei:
            spark.sql("""
                SELECT j.* FROM _jc2 t,
                LATERAL json_cols(t.payload, t.keycol) j
            """).collect()
        assert "LITERAL" in str(ei.value).upper()
        with pytest.raises(Exception) as ei2:
            spark.sql("""
                SELECT j.* FROM _jc2 t,
                LATERAL json_cols(t.payload, 'a', 'a') j
            """).collect()
        assert "duplicate" in str(ei2.value)


class TestImageAhash:
    def _media(self, spark, rows):
        # rows: list of (media_id, 64 raw pixel ints)
        payloads = [(mid, b"P5\n8 8\n255\n" + bytes(px))
                    for mid, px in rows]
        return spark.createDataFrame(
            payloads, "media_id long, payload binary")

    def test_banding_is_lossless_for_d_le_3(self, spark):
        # pigeonhole property: banded candidates must find EVERY pair
        # at hamming <= 3 — compare against brute force over all hashes
        from itertools import combinations

        from bigdata_tag_system_spark.operators.multimodal import (
            ahash_near_pairs, image_ahash_bands,
        )

        rows = [(m, [((m * 29 + k * 13) % 256) for k in range(64)])
                for m in range(30)]
        # plant twins: 100..102 copy image 0 with 1..3 pixels inverted
        for j, flips in [(100, 1), (101, 2), (102, 3)]:
            px = list(rows[0][1])
            for f in range(flips):
                px[f] = 255 - px[f]
            rows.append((j, px))
        hashed = image_ahash_bands(self._media(spark, rows))
        got = {(r["id_a"], r["id_b"]) for r in
               ahash_near_pairs(hashed, max_hamming=3).collect()}
        h = {r["media_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
             for r in hashed.collect()}

        def ham(a, b):
            return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

        brute = {(a, b) for a, b in combinations(sorted(h), 2)
                 if ham(h[a], h[b]) <= 3}
        assert got == brute
        # inverting k pixels flips at most ~k bits (plus mean drift);
        # the 1-flip twin must be found
        assert any(0 in p and 100 in p for p in got)

    def test_guards(self, spark):
        from bigdata_tag_system_spark.operators.multimodal import (
            ahash_near_pairs, image_ahash_bands,
        )

        bad = spark.createDataFrame(
            [(1, b"P5\n7 8\n255\n" + bytes(56))],
            "media_id long, payload binary")
        with pytest.raises(Exception) as ei:
            image_ahash_bands(bad).collect()
        assert "multiples of 8" in str(ei.value)
        good = image_ahash_bands(self._media(
            spark, [(1, list(range(64)))]))
        with pytest.raises(ValueError):
            ahash_near_pairs(good, max_hamming=4)

    def test_block_averaged_16x16_matches_8x8_expansion(self, spark):
        # a 16x16 image whose 2x2 blocks are constant must hash
        # identically to the 8x8 image of the block values
        from bigdata_tag_system_spark.operators.multimodal import (
            image_ahash_bands,
        )

        small = [((5 + k * 7) % 256) for k in range(64)]
        big = [0] * 256
        for r in range(16):
            for c in range(16):
                big[r * 16 + c] = small[(r // 2) * 8 + (c // 2)]
        m_small = self._media(spark, [(1, small)])
        m_big = spark.createDataFrame(
            [(1, b"P5\n16 16\n255\n" + bytes(big))],
            "media_id long, payload binary")
        hs = image_ahash_bands(m_small).collect()[0]
        hb = image_ahash_bands(m_big).collect()[0]
        assert tuple(hs)[1:] == tuple(hb)[1:]


class TestRuntimeBloomJoin:
    def test_might_contain_injected_and_confs_restored(
            self, spark, sf_dir):
        # the entry's value is the PLAN: a bloom_filter_agg subquery on
        # the selective side whose might_contain() lands in the fact
        # scan filter. Assert injection under the entry's confs, and
        # that the entry restores every conf it touches.
        from pyspark.sql import functions as F

        confs = {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
        }
        saved = {k: spark.conf.get(k, None) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            o = spark.read.parquet(f"{sf_dir}/orders.parquet") \
                .where("o_totalprice > 400000")
            j = (li.join(o, li.l_orderkey == o.o_orderkey)
                 .agg(F.count(F.lit(1)).alias("n")))
            plan = j._jdf.queryExecution().optimizedPlan().toString()
            assert "might_contain" in plan
            assert "bloom_filter_agg" in plan
        finally:
            for k, v in saved.items():
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)

        import __spark_entry__ as e

        e.queries()["join_runtime_bloom"](spark, sf_dir).collect()
        for k, v in saved.items():
            assert spark.conf.get(k, None) == v, k


class TestStateStoreReader:
    def test_retained_state_and_metadata(self, spark, tmp_path):
        # a 2-user stream: user a's session deadline is passed by the
        # final watermark (state removed, session emitted), user b's is
        # not (state retained) — the statestore batch reader must show
        # EXACTLY b's open session, and state-metadata must name the
        # operator
        import os

        from bigdata_tag_system_spark.streaming.stateful import (
            sessionize_stream,
        )

        h = 3_600_000
        rows = [
            (1, "a", 0, 1.0),
            (2, "a", 60_000, 2.0),
            # b's lone event sits near max ts: watermark (max-30min)
            # does not pass b's deadline (last + 60min)
            (3, "b", 3 * h, 5.0),
            (4, "c", 3 * h + 1, 1.5),  # max ts driver
        ]
        df = spark.createDataFrame(
            [(i, u, __import__("datetime").datetime.utcfromtimestamp(
                ms / 1000.0), v) for i, u, ms, v in rows],
            "event_id long, user_id string, ts timestamp, value double")
        src = str(tmp_path / "src")
        df.coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(df.schema).parquet(src)
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")
        q = (sessionize_stream(stream, gap_minutes=60,
                               watermark="30 minutes")
             .writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True)
             .foreachBatch(lambda b, _i:
                           b.write.mode("append").parquet(out))
             .start())
        q.awaitTermination()

        meta = spark.read.format("state-metadata").load(ckpt).collect()
        assert meta[0]["operatorName"] == "applyInPandasWithState"

        st = spark.read.format("statestore").load(ckpt).select(
            "key.user_id", "value.groupState.*",
            "value.timeoutTimestamp").collect()
        by_user = {r["user_id"]: r for r in st}
        # a's deadline (60s + 1h < wm = 3h+1ms - 30min) passed -> gone;
        # b and c retained with their timers at last + gap
        assert set(by_user) == {"b", "c"}
        b = by_user["b"]
        assert b["start_ms"] == 3 * h and b["last_ms"] == 3 * h
        assert b["count"] == 1 and b["value_sum"] == 5.0
        assert b["timeoutTimestamp"] == 4 * h
        # and a's one closed session was emitted by its timer
        emitted = spark.read.parquet(out)
        assert emitted.where("user_id = 'a'").count() == 1
        assert emitted.where("user_id in ('b','c')").count() == 0


class TestSessionizerCheckpointResume:
    def test_resume_from_checkpoint_matches_single_run(
            self, spark, tmp_path):
        # stop after draining file 1, add file 2, restart on the SAME
        # checkpoint: state (a's open session) must survive the restart
        # and the combined emissions must equal a one-shot replay
        import datetime

        from bigdata_tag_system_spark.streaming.stateful import (
            sessionize_stream,
        )

        h = 3_600_000

        def mk(rows):
            return spark.createDataFrame(
                [(i, u, datetime.datetime.utcfromtimestamp(ms / 1000.0),
                  v) for i, u, ms, v in rows],
                "event_id long, user_id string, ts timestamp, "
                "value double")

        batch1 = [(1, "a", 0, 1.0), (2, "a", 60_000, 2.0)]
        # file 2: extends a's session (same gap window? no — 5h later,
        # new session), plus enough watermark push to close everything
        batch2 = [(3, "a", 5 * h, 3.0), (4, "z", 9 * h, 0.5)]
        schema = mk(batch1).schema

        src = str(tmp_path / "src")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ckpt")

        def drain():
            stream = spark.readStream.schema(schema).parquet(src)
            q = (sessionize_stream(stream, gap_minutes=60,
                                   watermark="30 minutes")
                 .writeStream.outputMode("append")
                 .option("checkpointLocation", ckpt)
                 .trigger(availableNow=True)
                 .foreachBatch(lambda b, _i:
                               b.write.mode("append").parquet(out))
                 .start())
            q.awaitTermination()

        mk(batch1).coalesce(1).write.mode("append").parquet(src)
        drain()
        mk(batch2).coalesce(1).write.mode("append").parquet(src)
        drain()  # RESUME: same checkpoint, new file discovered
        resumed = sorted(map(tuple, spark.read.parquet(out).collect()))

        # one-shot reference replay over the same four events
        src2 = str(tmp_path / "src2")
        out2 = str(tmp_path / "out2")
        mk(batch1 + batch2).coalesce(1).write.parquet(src2)
        stream = spark.readStream.schema(schema).parquet(src2)
        q = (sessionize_stream(stream, gap_minutes=60,
                               watermark="30 minutes")
             .writeStream.outputMode("append")
             .option("checkpointLocation", str(tmp_path / "ckpt2"))
             .trigger(availableNow=True)
             .foreachBatch(lambda b, _i:
                           b.write.mode("append").parquet(out2))
             .start())
        q.awaitTermination()
        oneshot = sorted(map(tuple, spark.read.parquet(out2).collect()))

        assert resumed == oneshot
        # a has two closed sessions ([0,60s] and [5h]) — both emitted
        assert len([r for r in resumed if r[0] == "a"]) == 2


class TestJsonlCommitLogSink:
    """The Python DataSource streaming WRITER protocol, driven
    directly: stage -> commit-log flip, and the abort path."""

    def _writer(self, path):
        from bigdata_tag_system_spark.sources.pyds import (
            JsonlStreamWriter,
        )

        return JsonlStreamWriter(path, ["event_id", "value_i"])

    def _rows(self, ids):
        from pyspark.sql import Row

        return [Row(event_id=i, value_i=i * 31 % 1000) for i in ids]

    def test_commit_makes_batch_visible_atomically(self, tmp_path):
        import json
        import os

        from bigdata_tag_system_spark.sources.pyds import (
            committed_files,
        )

        path = str(tmp_path / "sink")
        w = self._writer(path)
        m1 = w.write(iter(self._rows([0, 1, 2])))
        m2 = w.write(iter(self._rows([3, 4])))
        # staged but uncommitted: invisible to readers
        assert committed_files(path) == []
        w.commit([m1, m2], batchId=0)
        files = committed_files(path)
        assert len(files) == 2
        assert os.listdir(os.path.join(path, "_staging")) == []
        got = sorted(
            json.loads(line)["event_id"]
            for f in files for line in open(f))
        assert got == [0, 1, 2, 3, 4]

    def test_abort_removes_staged_files_and_commit_log_silent(
            self, tmp_path):
        import os

        from bigdata_tag_system_spark.sources.pyds import (
            committed_files,
        )

        path = str(tmp_path / "sink")
        w = self._writer(path)
        m = w.write(iter(self._rows([7, 8])))
        assert os.path.exists(m.staged_file)
        w.abort([m, None], batchId=0)
        assert not os.path.exists(m.staged_file)
        assert committed_files(path) == []
        # a retried batch re-stages under a fresh name and commits
        m2 = w.write(iter(self._rows([7, 8])))
        w.commit([m2], batchId=0)
        assert len(committed_files(path)) == 1

    def test_empty_task_messages_are_skipped(self, tmp_path):
        from bigdata_tag_system_spark.sources.pyds import (
            committed_files,
        )

        path = str(tmp_path / "sink")
        w = self._writer(path)
        m_empty = w.write(iter([]))
        m_full = w.write(iter(self._rows([1])))
        w.commit([m_empty, m_full], batchId=3)
        assert len(committed_files(path)) == 1


class TestPagerankLiteral:
    def test_matches_distributed_operator(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            pagerank, pagerank_literal,
        )

        edges = spark.createDataFrame(
            [("a", "b", 3.0), ("a", "c", 1.0), ("b", "c", 2.0),
             ("c", "a", 1.0), ("d", "a", 5.0)],  # d dangling-in only
            "src string, dst string, w double")
        dist = {r["node"]: r["rank"] for r in
                pagerank(edges, weight="w", iterations=10).collect()}
        lit = {r["node"]: r["rank"] for r in
               pagerank_literal(edges, weight="w",
                                iterations=10).collect()}
        assert set(dist) == set(lit)
        for v in dist:
            assert abs(dist[v] - lit[v]) < 1e-12, (v, dist[v], lit[v])

    def test_unweighted_and_empty(self, spark):
        from bigdata_tag_system_spark.operators.graph import (
            pagerank, pagerank_literal,
        )

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string")
        dist = {r["node"]: r["rank"] for r in
                pagerank(edges, iterations=5).collect()}
        lit = {r["node"]: r["rank"] for r in
               pagerank_literal(edges, iterations=5).collect()}
        for v in dist:
            assert abs(dist[v] - lit[v]) < 1e-12
        empty = spark.createDataFrame([], "src string, dst string")
        assert pagerank_literal(empty).collect() == []

    def test_raises_loudly_on_unbounded_edge_list(self, spark):
        # the scale guard: a fact-sized edge list must NOT silently
        # materialize on the driver
        from bigdata_tag_system_spark.operators.graph import (
            pagerank_literal,
        )

        edges = spark.range(50).selectExpr(
            "cast(id as string) src", "cast(id + 1 as string) dst")
        with pytest.raises(ValueError) as ei:
            pagerank_literal(edges, max_edges=10)
        assert "max_edges" in str(ei.value)


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
