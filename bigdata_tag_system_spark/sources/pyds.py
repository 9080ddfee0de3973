"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API) — a
deterministic synthetic-events generator, demonstrating the connector
surface for systems with no built-in reader (internal feed APIs, custom
binary formats, simulation inputs).

Why it matters at scale: the reader plans its own INPUT PARTITIONS, so
a 1000-executor cluster pulls the source in parallel — the difference
between a connector and a driver-side `createDataFrame` loop. Rows are
a pure function of (row index) — no RNG, no clock — so any engine can
recompute the content closed-form (the correctness oracle does).

Reference contrast: the reference's only extensible input is a JDBC
table (`src/readers/`); this is the Spark-native answer for everything
that isn't a database.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

_DEFAULT_ROWS = 1000
_DEFAULT_PARTS = 4
_DEFAULT_CHUNK = 100


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` after registration.

    Options:
      rows        total row count (default 1000)
      partitions  input partitions to plan (default 4)

    Row ``i`` (0-based, globally): ``event_id = i``,
    ``user_id = i % 97``, ``event_type = types[i % 4]``,
    ``value_i = (i * 31) % 1000`` — integer so downstream aggregates
    are engine-exact.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return ("event_id bigint, user_id bigint, "
                "event_type string, value_i bigint")

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(
            rows=int(self.options.get("rows", _DEFAULT_ROWS)),
            parts=int(self.options.get("partitions", _DEFAULT_PARTS)),
        )

    def simpleStreamReader(self, schema) -> "SyntheticEventsStreamReader":
        # the STREAMING face of the same source (Spark 4
        # `spark.readStream.format(...)` over a Python data source):
        # offsets are plain row indexes, so progress tracking,
        # checkpoint recovery, and `readBetweenOffsets` replay are all
        # exact — rows are the same pure function of the index the
        # batch reader emits
        return SyntheticEventsStreamReader(
            rows=int(self.options.get("rows", _DEFAULT_ROWS)),
            chunk=int(self.options.get("chunk", _DEFAULT_CHUNK)),
        )


_TYPES = ["view", "click", "purchase", "error"]


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, rows: int, parts: int):
        if rows < 0 or parts < 1:
            raise ValueError(
                f"rows must be >= 0 and partitions >= 1, "
                f"got rows={rows}, partitions={parts}")
        self.rows, self.parts = rows, parts

    def partitions(self):
        # contiguous index ranges — each executor task generates its
        # slice independently; no partition overlaps, none missing
        return [InputPartition(i) for i in range(self.parts)]

    def read(self, partition: InputPartition):
        start = partition.value * self.rows // self.parts
        end = (partition.value + 1) * self.rows // self.parts
        for i in range(start, end):
            yield _row(i)


def _row(i: int) -> tuple:
    return (i, i % 97, _TYPES[i % 4], (i * 31) % 1000)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Bounded index-offset stream: each micro-batch advances the
    offset by ``chunk`` rows until ``rows`` is reached, then returns
    empty batches at a fixed offset (a drained-but-open stream). The
    driver-side ``read(start)`` prefetch is tiny (chunk-bounded);
    at-least-once replays route through ``readBetweenOffsets``, which
    regenerates the identical rows from the offsets alone — the
    replayability contract a production feed reader implements with a
    seekable upstream (Kafka offsets, file indexes)."""

    def __init__(self, rows: int, chunk: int):
        if rows < 0 or chunk < 1:
            raise ValueError(
                f"rows must be >= 0 and chunk >= 1, got "
                f"rows={rows}, chunk={chunk}")
        self.rows, self.chunk = rows, chunk

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        i = int(start["index"])
        if i >= self.rows:
            return iter([]), {"index": i}
        end = min(i + self.chunk, self.rows)
        return iter([_row(j) for j in range(i, end)]), {"index": end}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_row(j) for j in
                     range(int(start["index"]), int(end["index"]))])


def register(spark) -> None:
    """Idempotently register the format with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
