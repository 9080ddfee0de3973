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

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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


# ---------------------------------------------------------------------------
# Streaming WRITER (the sink half of the connector surface): a JSONL
# sink with the full two-phase task-stage / driver-commit protocol.
# ---------------------------------------------------------------------------


@dataclass
class JsonlCommitMessage(WriterCommitMessage):
    """Per-task commit message: where the task staged its rows."""

    staged_file: str
    n_rows: int


class JsonlCommitLogSink(DataSource):
    """``df.writeStream.format("jsonl_commitlog").option("path", p)`` —
    a Spark 4 Python DataSource STREAM WRITER (`streamWriter`), the
    sink-side twin of :class:`SyntheticEventsStreamReader`'s reader
    surface, demonstrating the exactly-once commit protocol a custom
    Python sink must implement:

    - ``write`` runs ON EXECUTORS, one call per task: rows are staged
      to a task-unique file under ``_staging/`` and the staged path
      travels back in the :class:`JsonlCommitMessage`. Nothing a task
      writes is visible to readers.
    - ``commit`` runs ON THE DRIVER once every task of the micro-batch
      succeeded: staged files are renamed into ``data/`` and the batch
      writes ONE commit-log entry (``_commits/{batchId}``) listing its
      final files. Readers trust the commit log only, so a batch is
      visible atomically or not at all.
    - ``abort`` runs on failure: staged files are deleted; the commit
      log never learns the batch existed. A retried batch re-stages
      under fresh task-unique names — no collision with the aborted
      attempt.

    This local-filesystem staging is the single-node stand-in for the
    production layout (task-unique object-store keys + a manifest
    flip); the PROTOCOL — stage, message, commit-log, abort — is
    identical, which is what the parity entry certifies. Idempotent
    re-commits (a driver retry of an already-committed batch) are
    handled by the commit log's ``os.replace`` overwrite of the same
    batchId entry listing the same files.
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_commitlog"

    def schema(self) -> str:  # pragma: no cover - required override
        return "event_id bigint"

    def streamWriter(self, schema, overwrite) -> "JsonlStreamWriter":
        return JsonlStreamWriter(self.options["path"],
                                 [f.name for f in schema.fields])


class JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, path: str, field_names: list):
        self.path = path
        self.field_names = field_names

    def write(self, iterator) -> JsonlCommitMessage:
        import json
        import os
        import uuid

        staging = os.path.join(self.path, "_staging")
        os.makedirs(staging, exist_ok=True)
        fname = os.path.join(staging, f"{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(fname, "w") as f:
            for row in iterator:
                f.write(json.dumps(
                    {k: row[k] for k in self.field_names},
                    sort_keys=True) + "\n")
                n += 1
        return JsonlCommitMessage(staged_file=fname, n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        import json
        import os
        import tempfile

        data_dir = os.path.join(self.path, "data")
        log_dir = os.path.join(self.path, "_commits")
        os.makedirs(data_dir, exist_ok=True)
        os.makedirs(log_dir, exist_ok=True)
        final = []
        for i, m in enumerate(messages):
            if m is None or m.n_rows == 0:
                if m is not None and os.path.exists(m.staged_file):
                    os.remove(m.staged_file)
                continue
            dst = os.path.join(data_dir, f"batch{batchId}-{i}.jsonl")
            os.replace(m.staged_file, dst)
            final.append({"file": dst, "n_rows": m.n_rows})
        # one atomic commit-log entry per batch: readers resolve
        # visibility through this, never by listing data/
        fd, tmp = tempfile.mkstemp(dir=log_dir, prefix="._c")
        with os.fdopen(fd, "w") as f:
            json.dump({"batch_id": batchId, "files": final}, f)
        os.replace(tmp, os.path.join(log_dir, str(batchId)))

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged_file):
                os.remove(m.staged_file)


def committed_files(path: str) -> list:
    """Files named by the sink's commit log, in batch order — the only
    reader-visible view of the sink."""
    import json
    import os

    log_dir = os.path.join(path, "_commits")
    if not os.path.isdir(log_dir):
        return []
    out = []
    for name in sorted((n for n in os.listdir(log_dir)
                        if n.isdigit()), key=int):
        with open(os.path.join(log_dir, name)) as f:
            out.extend(e["file"] for e in json.load(f)["files"])
    return out


def register(spark) -> None:
    """Idempotently register the formats with a session."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonlCommitLogSink)
