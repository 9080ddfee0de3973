"""Custom stateful streaming operator: session aggregation with
``applyInPandasWithState``.

The reference has no streaming at all (SURVEY §2.9 — ``trigger_type
REALTIME`` is an unimplemented spec enum, `docs/标准需求文档.md:62`); this
is the engine-roadmap stateful piece: per-user sessionization over an
event stream, the streaming analogue of
:func:`bigdata_tag_system_spark.operators.features.sessionize`.

Scale design:

- State is keyed by ``user_id`` — Spark hash-partitions groups across
  executors; per-key state is a single fixed-width tuple (4 longs /
  doubles), so state size is O(active users), independent of event rate.
- ``EventTimeTimeout`` + the input watermark bound both lateness and
  state lifetime: a session with no events for ``gap`` closes when the
  watermark passes its deadline, and its state is removed.
- Arrow-batched pandas transfer (not row-at-a-time): each group's rows
  arrive as pandas DataFrames.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("session_start_ms", LongType()),
        StructField("session_end_ms", LongType()),
        StructField("event_count", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)

# (session_start_ms, last_event_ms, event_count, value_sum)
_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
        StructField("count", LongType()),
        StructField("value_sum", DoubleType()),
    ]
)


def _session_fn_factory(gap_ms: int):
    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]

        def emit(start: int, end: int, cnt: int, vsum: float) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start_ms": [start],
                    "session_end_ms": [end],
                    "event_count": [cnt],
                    "value_sum": [vsum],
                }
            )

        if state.hasTimedOut:
            # watermark passed start of the idle gap → close the session
            start, last, cnt, vsum = state.get
            state.remove()
            yield emit(start, last, cnt, vsum)
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values("ts")
        ts_ms = (rows["ts"].astype("int64") // 1_000_000).to_list()
        vals = rows["value"].astype("float").to_list()

        if state.exists:
            start, last, cnt, vsum = state.get
        else:
            start, last, cnt, vsum = ts_ms[0], ts_ms[0], 0, 0.0

        for t, v in zip(ts_ms, vals):
            if t - last > gap_ms and cnt > 0:
                yield emit(start, last, cnt, vsum)
                start, cnt, vsum = t, 0, 0.0
            last = max(last, t)
            cnt += 1
            vsum += v

        state.update((start, last, cnt, vsum))
        # close the open session once event time passes last + gap
        state.setTimeoutTimestamp(last + gap_ms)

    return fn


def sessionize_stream(
    stream: DataFrame,
    gap_minutes: int = 60,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session aggregates over a stream (append mode).

    A session = maximal run of a user's events with inter-event gaps ≤
    ``gap_minutes``. Sessions are emitted when (a) a later event opens the
    next session, or (b) the event-time watermark passes the idle
    deadline (``EventTimeTimeout``). Input must have event-time column
    ``ts_col``; a watermark is applied here.
    """
    from pyspark.sql import functions as F

    from bigdata_tag_system_spark.streaming.rule_stream import ensure_event_time

    prepared = (
        ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .select(
            F.col(user_col).cast("string").alias("user_id"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).cast("double").alias("value"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(gap_minutes * 60_000),
        SESSION_OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ewma_raw", DoubleType()),
    ]
)

# (weighted_sum S, weight_sum W, events_seen n) — the adjust=True
# recursion S' = β·S + v, W' = β·W + 1, ewma = S/W
_EWMA_STATE_SCHEMA = StructType(
    [
        StructField("s", DoubleType()),
        StructField("w", DoubleType()),
        StructField("n", LongType()),
    ]
)


def _ewma_fn_factory(beta: float):
    def fn(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        # event order must be total and engine-independent: ts then
        # event_id breaks same-timestamp ties exactly like the batch
        # closed form's window ordering
        rows = rows.sort_values(["ts", "event_id"])
        s, w, n = state.get if state.exists else (0.0, 0.0, 0)
        for v in rows["value"].astype("float"):
            s = beta * s + v
            w = beta * w + 1.0
            n += 1
        state.update((s, w, n))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "ewma_raw": [s / w]}
        )

    return fn


def ewma_stream(
    stream: DataFrame,
    beta: float = 0.9,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user exponentially-weighted moving average over a stream
    (update mode): each micro-batch emits the user's EWMA over ALL
    events seen so far.

    The recursion ``S' = β·S + v, W' = β·W + 1`` carried in state is
    algebraically the closed form ``Σβ^(N-i)·v_i / Σβ^(N-i)`` that the
    batch catalog query (`events_ewma_value`) computes in one window
    pass — so a full replay's final emission per user must equal the
    batch result exactly (modulo float association order, absorbed by
    output rounding) — **provided event-time order holds across
    micro-batch boundaries**. Events are sorted by (ts, id) only WITHIN
    each micro-batch; a later batch delivering an earlier-timestamped
    event folds it into state in arrival order (the recursion is not
    commutative), silently diverging from the batch closed form. That
    matches at-source-ordered feeds (per-key ordered Kafka partitions,
    file replay in order); for disordered sources, buffer behind a
    watermark before folding, or re-run the batch formulation on the
    corrected log. State is three fixed-width cells per active user;
    no timeout — EWMA state is the product, not a pending window, so
    it lives as long as the user does (a production deployment caps it
    with ProcessingTimeTimeout eviction if the key space is unbounded).
    """
    from pyspark.sql import functions as F

    from bigdata_tag_system_spark.streaming.rule_stream import (
        ensure_event_time,
    )

    prepared = ensure_event_time(stream, ts_col).select(
        F.col(user_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _ewma_fn_factory(beta),
        EWMA_OUTPUT_SCHEMA,
        _EWMA_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Space-Saving heavy hitters: bounded top-k state per group
# ---------------------------------------------------------------------------

SS_OUTPUT_SCHEMA = StructType(
    [
        StructField("group", StringType()),
        StructField("item", LongType()),
        StructField("est", LongType()),
        StructField("err", LongType()),
        StructField("n_seen", LongType()),
    ]
)

_SS_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errs", ArrayType(LongType())),
        StructField("n", LongType()),
    ]
)


def _space_saving_fn_factory(capacity: int):
    def fn(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        # deterministic fold order, same convention as the EWMA state
        rows = rows.sort_values(["ts", "event_id"])
        if state.exists:
            items, counts, errs, n = state.get
            d = {int(i): [int(c), int(e)]
                 for i, c, e in zip(items, counts, errs)}
            n = int(n)
        else:
            d, n = {}, 0
        for it in rows["item"].astype("int64"):
            it = int(it)
            n += 1
            if it in d:
                d[it][0] += 1
            elif len(d) < capacity:
                d[it] = [1, 0]
            else:
                # evict the (min count, max item) entry — a total order,
                # so the summary is a pure function of the fold order
                evict = min(d, key=lambda k: (d[k][0], -k))
                c = d[evict][0]
                del d[evict]
                d[it] = [c + 1, c]
        state.update((
            list(d.keys()),
            [v[0] for v in d.values()],
            [v[1] for v in d.values()],
            n,
        ))
        yield pd.DataFrame(
            {
                "group": [str(key[0])] * len(d),
                "item": list(d.keys()),
                "est": [v[0] for v in d.values()],
                "err": [v[1] for v in d.values()],
                "n_seen": [n] * len(d),
            }
        )

    return fn


def space_saving_stream(
    stream: DataFrame,
    group_col: str = "event_type",
    item_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    capacity: int = 2048,
) -> DataFrame:
    """Streaming heavy hitters per group by the Space-Saving summary
    (Metwally et al.): at most ``capacity`` counters per group; a new
    item arriving at a full summary evicts the min-count entry and
    inherits its count as its error bound.

    Guarantees (per group, N items seen): every item with true
    frequency > N/capacity is IN the summary, and for every entry
    ``est - err ≤ true ≤ est``. While distinct items ≤ capacity the
    summary is EXACT (err = 0) — which is what makes the replay
    oracle-checkable against a plain batch ``GROUP BY count`` at test
    scale, while the same code carries the bounded-memory guarantee
    when cardinality explodes at production scale.

    State per group is three bounded arrays + a counter — O(capacity),
    never O(distinct items). Groups hash-partition across executors;
    the eviction tie-break (min count, then largest item) is a total
    order, so the summary is deterministic given arrival order. Update
    mode emits each group's full summary every micro-batch; take the
    emission with the highest ``n_seen`` for the final state.
    """
    from pyspark.sql import functions as F

    from bigdata_tag_system_spark.streaming.rule_stream import (
        ensure_event_time,
    )

    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    prepared = ensure_event_time(stream, ts_col).select(
        F.col(group_col).cast("string").alias("group"),
        F.col(item_col).cast("long").alias("item"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).cast("long").alias("event_id"),
    )
    return prepared.groupBy("group").applyInPandasWithState(
        _space_saving_fn_factory(capacity),
        SS_OUTPUT_SCHEMA,
        _SS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
