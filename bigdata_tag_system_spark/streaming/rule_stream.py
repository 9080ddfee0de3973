"""Structured Streaming rule evaluation (the reference's roadmap item).

The reference defines ``trigger_type REALTIME`` only as a spec enum
(`docs/标准需求文档.md:62`; roadmap `docs/标签架构演进方案.md:347-351`) —
nothing implements it (SURVEY §2.9). Here it's real: the SAME compiled
rule predicates run over ``readStream``; late data is handled with
watermarks; sinks go through ``foreachBatch`` so the batch upsert writers
are reused verbatim.

Scale notes: stateful aggregation state is keyed by (user, window) —
watermark bounds state size; ``dropDuplicates`` within watermark gives
exactly-once-per-event tagging when the source replays.
"""

from __future__ import annotations

import datetime as _dt
from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigdata_tag_system_spark.rules.model import Rule
from bigdata_tag_system_spark.operators.tagging import TagEngine


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Coerce a TIMESTAMP_NTZ event-time column to TIMESTAMP (ltz).

    Spark 4 reads parquet timestamps written without UTC adjustment (the
    test tables, pandas-written files generally) as TIMESTAMP_NTZ, and
    ``withWatermark`` rejects NTZ event time outright
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The cast reinterprets the
    wall-clock value in the session timezone — watermark semantics only
    need a consistent ordering, which any fixed-offset reinterpretation
    preserves."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def streaming_tag_assignments(
    stream: DataFrame,
    rules: Sequence[Rule],
    user_col: str = "user_id",
    event_id_col: str | None = None,
    ts_col: str | None = None,
    watermark: str = "10 minutes",
    as_of: _dt.date | str | None = None,
) -> DataFrame:
    """Apply the one-pass tag evaluation to a streaming DataFrame.

    Same ``TagEngine`` (the compiled predicates are plan fragments — they
    don't care whether the scan is batch or stream). With ``event_id_col``
    + ``ts_col``, duplicates within the watermark are dropped.
    """
    if ts_col:
        stream = ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        if event_id_col:
            # dropDuplicatesWithinWatermark: dedup state is purged once
            # the watermark passes (a plain dropDuplicates([id]) keeps
            # every id ever seen — unbounded state on a long stream)
            stream = stream.dropDuplicatesWithinWatermark([event_id_col])
    engine = TagEngine(list(rules), user_col=user_col, as_of=as_of)
    return engine.assignments(stream)


def windowed_event_aggregates(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user tumbling-window aggregates with late-data watermarking.

    The upstream pipeline that produces the reference's ``*_30d`` derived
    fact columns (SURVEY §2.8: absent there, standard here).
    """
    return (
        ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            user_col,
            "event_count",
            "value_sum",
        )
    )


def session_window_aggregates(
    stream: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
    gap: str = "60 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user SESSION-window aggregates via Spark's native
    ``session_window`` — the engine-managed counterpart of the custom
    ``streaming.stateful.sessionize_stream``.

    Two sessionizers on purpose: ``session_window`` is the idiomatic
    path (state merging, watermark eviction, and window coalescing all
    inside the JVM state store — no Python worker in the loop), while
    the ``applyInPandasWithState`` variant exists for semantics the
    native operator can't express (per-session custom payloads,
    non-gap close rules). When plain gap sessionization is what you
    need, THIS is the one to run at 100 TB: state is keyed
    (user, session), merged natively, and bounded by the watermark.

    Streaming session windows are APPEND-mode only (Spark emits a
    session exactly once, when the watermark passes last event + gap;
    sessions still open inside the watermark horizon at stream end are
    withheld) — see ``stream_session_native_parity`` for the replay
    contract and its batch oracle.

    ``value`` is aggregated in integer CENTS (round-then-cast, exact
    for cent-denominated doubles), so the output is summation-order-
    independent and byte-comparable across engines.
    """
    return (
        ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("sw"),
            F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            .alias("value_cents"),
        )
        .select(
            F.unix_millis(F.col("sw.start")).alias("session_start_ms"),
            F.unix_millis(F.col("sw.end")).alias("session_end_ms"),
            user_col,
            "event_count",
            "value_cents",
        )
    )


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact-dedup a document stream at ingest.

    The streaming half of :func:`operators.dedup.exact_dedup`: digest
    the normalized text and keep the first arrival per digest within the
    watermark horizon. State = one digest per distinct doc seen inside
    the horizon, purged as the watermark advances — the shape that lets
    a 100 TB/day ingest dedup without re-scanning the corpus.
    """
    from bigdata_tag_system_spark.functions.text import normalize_text

    # null text → null digest, and dropDuplicates* treats null keys as
    # equal — which would collapse every text-less row into one. Give
    # null-text rows a unique per-row key so they pass through untouched.
    digest = F.coalesce(F.md5(normalize_text(text_col)), F.expr("uuid()"))
    return (
        ensure_event_time(stream, ts_col).withWatermark(ts_col, watermark)
        .withColumn("_digest", digest)
        .dropDuplicatesWithinWatermark(["_digest"])
        .drop("_digest")
    )


def tag_stream_with_rule_reload(
    stream: DataFrame,
    rules_path: str,
    writer: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    user_col: str = "user_id",
    as_of: _dt.date | str | None = None,
    definitions_path: str | None = None,
    trigger_available_now: bool = True,
):
    """Tag a stream with the rule catalog re-read EVERY micro-batch.

    Rule edits (new tags, threshold changes, deactivations) take effect
    on the next batch without restarting the query — the catalog read is
    a bounded broadcast-sized load (see ``read_rule_catalog``), so the
    per-batch cost is a driver round-trip, not a scan. ``writer(tagged,
    batch_id)`` receives the batch's ``(user_id, tag_id, tag_detail)``
    assignments; pair with an idempotent upsert for exactly-once effect.
    """
    from bigdata_tag_system_spark.sources.readers import read_rule_catalog

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        rules = read_rule_catalog(spark, rules_path, definitions_path)
        engine = TagEngine(rules, user_col=user_col, as_of=as_of)
        writer(engine.assignments(batch_df), batch_id)

    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(_process)
        .trigger(availableNow=trigger_available_now)
        .start()
    )


def run_foreach_batch_upsert(
    stream_df: DataFrame,
    batch_writer: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """writeStream → foreachBatch(batch_writer), checkpointed.

    ``batch_writer(batch_df, batch_id)`` typically wraps
    :func:`bigdata_tag_system_spark.sources.writers.jdbc_upsert` — the
    idempotent upsert makes foreachBatch's at-least-once delivery
    effectively exactly-once.
    """
    writer = (
        stream_df.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(batch_writer)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_cdc_apply_stream(
    change_stream: DataFrame,
    store_path: str,
    key_cols,
    checkpoint_dir: str,
    op_col: str = "_op",
    trigger_available_now: bool = True,
):
    """Stream a CDC changelog into a keyed file store: each micro-batch
    applies atomically via
    :func:`bigdata_tag_system_spark.sources.writers.apply_changeset`
    (upserts + deletes in one stage-and-swap rewrite).

    Semantics are LAST-WRITER-WINS across micro-batches in stream
    order — an upsert in batch 7 overwrites batch 3's value, a delete
    removes it, a later upsert re-inserts it. Within one micro-batch a
    key carrying both ops is rejected loudly (apply_changeset's
    conflict guard), because that order is NOT defined. Replay safety:
    apply_changeset is idempotent for upserts and deletes alike, so
    foreachBatch's at-least-once delivery is effectively exactly-once.
    """
    from bigdata_tag_system_spark.sources.writers import apply_changeset

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        apply_changeset(
            batch_df.sparkSession, batch_df, store_path,
            key_cols=key_cols, op_col=op_col)

    return run_foreach_batch_upsert(
        change_stream, _apply, checkpoint_dir,
        trigger_available_now=trigger_available_now)


def stream_stream_attribution_join(
    left: DataFrame,
    right: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_lag: str = "1 hour",
    watermark: str = "30 minutes",
    how: str = "inner",
    id_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Stream-stream INNER join: each right-stream event matched to the
    left-stream events it followed within ``max_lag`` (click→purchase
    attribution, impression→conversion, request→response pairing).

    Both sides carry watermarks and the join condition bounds the
    event-time distance — the two requirements that let Spark EVICT
    buffered rows (an unbounded stream-stream join buffers both streams
    forever). State per side ≈ watermark + lag horizon of rows, keyed
    by ``user_col``. Inner join only: emitted matches are final, so an
    availableNow replay equals the batch range join row-for-row — the
    parity the oracle checks. ``how="left_outer"`` additionally emits
    each unmatched left row ONCE with NULL right columns, but only when
    the watermark proves no match can still arrive (left ts + lag <
    join watermark) — tail-of-stream unmatched rows stay buffered, the
    exact emission set the outer-parity oracle re-derives.
    """
    # id/value columns are parameterized (streams without an `event_id`
    # or `value` column plan fine: pass id_col=..., value_col=None) but
    # the OUTPUT aliases stay fixed l_/r_event_id, r_value — downstream
    # parity oracles key on the output shape, not the input names
    l = ensure_event_time(left, ts_col).withWatermark(ts_col, watermark) \
        .select(
            F.col(user_col).alias("l_user"),
            F.col(ts_col).alias("l_ts"),
            F.col(id_col).alias("l_event_id"),
        )
    r_cols = [
        F.col(user_col).alias("r_user"),
        F.col(ts_col).alias("r_ts"),
        F.col(id_col).alias("r_event_id"),
    ]
    if value_col is not None:
        r_cols.append(F.col(value_col).alias("r_value"))
    r = ensure_event_time(right, ts_col).withWatermark(ts_col, watermark) \
        .select(*r_cols)
    cond = (
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return l.join(r, cond, how)
