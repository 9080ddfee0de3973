"""Stateful streaming on Spark 4's ``transformWithStateInPandas`` —
the successor API to ``applyInPandasWithState`` (SPARK-46815): an
object-oriented StatefulProcessor with named state variables
(value/list/map), first-class timers, and optional state TTL, running
on the RocksDB state store.

This module ports the sessionizer from
:mod:`bigdata_tag_system_spark.streaming.stateful` to the new API with
IDENTICAL emission semantics, so the same batch oracle certifies both:
a session closes when (a) a later event of the same user starts the
next session, or (b) the event-time watermark passes the session's
idle deadline (``last_event + gap``) — case (b) is an event-time TIMER
here, where the old API used ``GroupStateTimeout.EventTimeTimeout``.

Scale design (unchanged from the old API): state is one fixed-width
tuple per active user, hash-partitioned by key across executors; the
watermark bounds both lateness and state lifetime; rows arrive as
Arrow-batched pandas frames. What the new API adds at scale: multiple
independently-evolvable state variables per key, map/list state
(point lookups instead of whole-value rewrites in RocksDB), per-state
TTL, and timers decoupled from state (``listTimers``/``deleteTimer``).

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` — set by
:func:`sessionize_stream_tws` callers or session conf; the HDFS-backed
default store does not support transformWithState).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

TWS_SESSION_OUTPUT_SCHEMA = (
    "user_id string, session_start_ms long, session_end_ms long, "
    "event_count long, value_sum double"
)

_TWS_STATE_SCHEMA = (
    "start_ms long, last_ms long, count long, value_sum double"
)


class SessionProcessor(StatefulProcessor):
    """Per-user sessionizer: gap-bounded session aggregates with an
    event-time timer closing idle sessions.

    Emission parity with ``stateful._session_fn_factory`` is currently
    pinned ONLY by the fake-handle-driven pytest
    (tests/test_round11_ops.py): ``transformWithStateInPandas`` cannot
    run in this container (``google.protobuf`` is absent), so no
    catalog entry exercises the runtime yet. The moment the protobuf
    dependency exists, add a `stream_tws_sessionize_parity` entry and
    certify it against the existing `stream_sessionize_parity` oracle
    (expected byte-identical result sets).
    """

    def __init__(self, gap_ms: int):
        self._gap_ms = int(gap_ms)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._session = handle.getValueState("session", _TWS_STATE_SCHEMA)

    def _emit(self, user_id: str, start: int, end: int, cnt: int,
              vsum: float) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": [user_id],
            "session_start_ms": [start],
            "session_end_ms": [end],
            "event_count": [cnt],
            "value_sum": [vsum],
        })

    def handleInputRows(
        self,
        key: Any,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        batch = pd.concat(list(rows), ignore_index=True)
        batch = batch.sort_values("ts")
        ts_ms = (batch["ts"].astype("int64") // 1_000_000).to_list()
        vals = batch["value"].astype("float").to_list()

        if self._session.exists():
            start, last, cnt, vsum = self._session.get()
        else:
            start, last, cnt, vsum = ts_ms[0], ts_ms[0], 0, 0.0

        for t, v in zip(ts_ms, vals):
            if t - last > self._gap_ms and cnt > 0:
                yield self._emit(user_id, start, last, cnt, vsum)
                start, cnt, vsum = t, 0, 0.0
            last = max(last, t)
            cnt += 1
            vsum += v

        self._session.update((start, last, cnt, vsum))
        # ONE live timer per key at the current idle deadline: timers
        # are decoupled from state in this API, so the stale deadline
        # from the previous batch must be deleted explicitly (the old
        # API's setTimeoutTimestamp overwrote it implicitly)
        deadline = last + self._gap_ms
        for t in self._handle.listTimers():
            if t != deadline:
                self._handle.deleteTimer(t)
        self._handle.registerTimer(deadline)

    def handleExpiredTimer(
        self,
        key: Any,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo,
    ) -> Iterator[pd.DataFrame]:
        # watermark passed the idle deadline -> close the open session
        if self._session.exists():
            start, last, cnt, vsum = self._session.get()
            self._session.clear()
            yield self._emit(key[0], start, last, cnt, vsum)

    def close(self) -> None:
        pass


def sessionize_stream_tws(
    stream: DataFrame,
    gap_minutes: int = 60,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session aggregates over a stream (append mode) on the
    ``transformWithStateInPandas`` engine — same contract as
    :func:`bigdata_tag_system_spark.streaming.stateful.sessionize_stream`.
    """
    from pyspark.sql import functions as F

    from bigdata_tag_system_spark.streaming.rule_stream import (
        ensure_event_time,
    )

    prepared = (
        ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("string").alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        SessionProcessor(gap_minutes * 60_000),
        TWS_SESSION_OUTPUT_SCHEMA,
        "append",
        "eventTime",
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
