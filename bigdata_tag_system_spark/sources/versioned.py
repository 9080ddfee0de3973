"""Versioned parquet store with time travel — the snapshot-isolation
storage pattern (what Delta/Iceberg provide) built from primitives, for
deployments without a table format.

Layout::

    {path}/_manifest.json     -> {"current": N, "versions": [1..N]}
    {path}/v1/  {path}/v2/ …  -> immutable parquet snapshots

Invariants:

- Snapshot dirs are IMMUTABLE once the manifest names them: a writer
  never touches an existing ``v{n}``, so any reader that resolved a
  version keeps a consistent view for the whole job regardless of
  concurrent writes (snapshot isolation, reader-side).
- The manifest flips via write-temp + ``os.replace`` — atomic on POSIX,
  so readers see either the old or the new manifest, never a torn one.
- Old versions stay readable until :func:`vacuum` removes them —
  time travel (“what did the store say at version 3?”) is just
  ``read_version(path, 3)``.

At 100 TB each version is a full snapshot — the simplicity/space
trade-off of this pattern vs Delta's delta logs; use it for dimension
stores and rule catalogs (small, audited, rewritten whole), not for
fact tables. The reference rewrites its MySQL store in place
(``src/writers/mysql_writer.py``) and keeps no history at all.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST = "_manifest.json"


def _read_manifest(path: str) -> dict:
    p = os.path.join(path, _MANIFEST)
    if not os.path.exists(p):
        return {"current": 0, "versions": []}
    with open(p) as f:
        return json.load(f)


def _write_manifest(path: str, manifest: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=path, prefix="._manifest")
    with os.fdopen(fd, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, _MANIFEST))


def _lease_path(path: str, n: int) -> str:
    return os.path.join(path, f"._inflight_v{n}")


def write_version(
    df: DataFrame, path: str, heartbeat_seconds: float = 15.0
) -> int:
    """Write ``df`` as the next snapshot version; returns its number.

    The snapshot lands fully in ``v{n}`` BEFORE the manifest flips to
    it, so a crash mid-write leaves the store at the previous version
    with an orphan directory — never a half-visible snapshot.

    Liveness is advertised through a HEARTBEAT LEASE, not file mtimes:
    a ``._inflight_v{n}`` marker is dropped before the Spark write
    starts and a daemon thread refreshes its mtime every
    ``heartbeat_seconds`` until the write finishes, so a legitimate
    write whose job spends arbitrarily long in upstream stages (no
    task files landing yet) still looks alive to :func:`gc_orphans` —
    the mtime-of-newest-file heuristic alone would misread that writer
    as crashed and reclaim the slot mid-write. The lease is removed
    after the manifest flip (or after a failed write, whose orphan
    then ages out under the fallback heuristic).
    """
    import threading

    os.makedirs(path, exist_ok=True)
    m = _read_manifest(path)
    n = int(m["current"]) + 1
    lease = _lease_path(path, n)
    # O_EXCL claim: two concurrent writers race for the same next
    # version; the loser must fail HERE, before it can touch (or later
    # delete) the winner's heartbeat lease. A lease whose mtime is
    # STALE (no heartbeat for >= 4 heartbeat periods, floor 60 s) is a
    # dead writer killed before v{n} materialized — gc_orphans can't
    # see it (no v{n} dir) — so it is reclaimed here instead of
    # wedging every future write. Reclaim is serialized through an
    # O_EXCL RECLAIM MARKER: only the marker holder may unlink the
    # stale lease, so two writers can never both pass the staleness
    # check and have the second one unlink a lease the first just
    # re-claimed (the stat-then-remove TOCTOU a bare re-check leaves
    # open). Under the marker, a fresh-again lease (someone claimed
    # between our stat and our marker) fails the re-check and we back
    # off instead of removing it.
    stale_after = max(60.0, 4.0 * heartbeat_seconds)

    def _claim() -> int:
        return os.open(lease, os.O_WRONLY | os.O_CREAT | os.O_EXCL)

    try:
        fd = _claim()
    except FileExistsError:
        import time as _time

        try:
            age = _time.time() - os.stat(lease).st_mtime
        except OSError:
            age = float("inf")  # vanished: loser finished; retry claim
        if age < stale_after:
            raise RuntimeError(
                f"concurrent write_version in flight for v{n} at"
                f" {path!r} (lease {lease} heartbeat {age:.0f}s ago)"
            ) from None
        marker = lease + ".reclaim"
        try:
            # A crashed reclaimer's marker would wedge all future
            # reclaims; one that is itself past the staleness horizon
            # is cleared first (the only unserialized remove left, and
            # its race window is scheduler-tiny vs the 60 s horizon).
            if _time.time() - os.stat(marker).st_mtime >= stale_after:
                os.remove(marker)
        except OSError:
            pass
        try:
            mfd = os.open(marker, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            raise RuntimeError(
                f"concurrent write_version in flight for v{n} at"
                f" {path!r} (another writer is reclaiming {lease})"
            ) from None
        os.close(mfd)
        try:
            try:
                if _time.time() - os.stat(lease).st_mtime >= stale_after:
                    os.remove(lease)
            except OSError:
                pass
            try:
                fd = _claim()
            except FileExistsError:
                raise RuntimeError(
                    f"concurrent write_version in flight for v{n} at"
                    f" {path!r} (lease {lease} re-claimed by a live"
                    " writer during reclaim)"
                ) from None
        finally:
            try:
                os.remove(marker)
            except OSError:
                pass
    lease_token = f"{os.getpid()}:{id(df)}"
    with os.fdopen(fd, "w") as f:
        f.write(lease_token)
    stop = threading.Event()

    def _beat() -> None:
        while not stop.wait(heartbeat_seconds):
            try:
                os.utime(lease, None)
            except OSError:
                return

    t = threading.Thread(target=_beat, daemon=True)
    t.start()
    try:
        df.write.mode("errorifexists").parquet(
            os.path.join(path, f"v{n}"))
        m["current"] = n
        m["versions"] = list(m.get("versions", [])) + [n]
        _write_manifest(path, m)
    finally:
        stop.set()
        t.join(timeout=heartbeat_seconds + 1.0)
        # remove ONLY our own lease: a pid-check before unlink keeps a
        # failed writer from deleting a concurrent winner's heartbeat
        # (which would degrade gc_orphans back to the mtime heuristic)
        try:
            with open(lease) as f:
                if f.read() == lease_token:
                    os.remove(lease)
        except OSError:
            pass
    return n


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a snapshot — the current one, or any retained ``version``."""
    m = _read_manifest(path)
    if not m["versions"]:
        raise ValueError(f"no versions at {path!r}")
    v = int(m["current"]) if version is None else int(version)
    if v not in m["versions"]:
        raise ValueError(
            f"version {v} not in store {path!r} (have {m['versions']})")
    return spark.read.parquet(os.path.join(path, f"v{v}"))


def history(path: str) -> list[int]:
    """Retained version numbers, oldest first."""
    return list(_read_manifest(path)["versions"])


def vacuum(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots; returns the
    removed version numbers. The manifest flips BEFORE directories are
    deleted, so a reader racing the vacuum either resolved a retained
    version or fails loudly at manifest resolution — never reads a
    half-deleted snapshot it resolved late."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    m = _read_manifest(path)
    keep = m["versions"][-keep_last:]
    drop = [v for v in m["versions"] if v not in keep]
    m["versions"] = keep
    _write_manifest(path, m)
    for v in drop:
        shutil.rmtree(os.path.join(path, f"v{v}"), ignore_errors=True)
    return drop


def version_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change-data-feed between two retained snapshots: one row per
    key whose state changed, ``op ∈ {insert, delete, update}`` with
    the old/new value structs. The CDC extraction a versioned store
    makes FREE — downstream consumers replay ``diff(v_from, v_to)``
    instead of rescanning snapshots.

    ``update`` means the non-key struct genuinely differs
    (null-safe) — a rewrite that lands identical values is NOT a
    change. One full-outer join on the key, no driver state.
    """
    a = read_version(spark, path, v_from)
    b = read_version(spark, path, v_to)
    if set(a.columns) != set(b.columns):
        raise ValueError(
            f"schema drift between v{v_from} and v{v_to}: "
            f"{sorted(a.columns)} vs {sorted(b.columns)}")
    vals = [c for c in a.columns if c not in key_cols]
    sa = a.select(*key_cols, F.struct(*vals).alias("old"))
    sb = b.select(*key_cols, F.struct(*vals).alias("new"))
    j = sa.join(sb, list(key_cols), "full_outer")
    return j.select(
        *key_cols,
        F.when(F.col("new").isNull(), F.lit("delete"))
        .when(F.col("old").isNull(), F.lit("insert"))
        .otherwise(F.lit("update")).alias("op"),
        "old", "new",
    ).where(
        F.col("old").isNull() | F.col("new").isNull()
        | ~F.col("old").eqNullSafe(F.col("new"))
    )


def gc_orphans(path: str, min_age_seconds: float = 3600.0) -> list[str]:
    """Remove snapshot directories the manifest does not name.

    :func:`write_version` lands the snapshot BEFORE flipping the
    manifest, so a crash mid-write leaves an orphan ``v{n}`` directory
    that no reader can ever resolve. The ONLY slot the protocol can
    leak into is ``v{current+1}`` — :func:`write_version` always
    targets it with ``errorifexists`` — and a leaked one therefore
    also WEDGES every future :func:`write_version`. That same slot is
    the one a healthy in-flight writer legally occupies, so the two
    states are distinguished by the writer's HEARTBEAT LEASE first and
    by age second: a ``v{current+1}`` whose ``._inflight_v{n}`` lease
    is fresher than ``min_age_seconds`` is a live writer and spared
    (the lease thread in :func:`write_version` refreshes it every few
    seconds, so a long upstream-stage stall cannot make a live write
    look crashed — the pure-mtime heuristic could); a STALE lease
    means the writer died holding it, so the slot (and the lease) are
    reclaimed. A candidate with NO lease (foreign writer, or a failed
    write whose lease was cleaned up) falls back to the newest-mtime
    age heuristic. Any other unnamed ``v<digits>`` dir is unreachable
    garbage and swept regardless of age. The manifest is re-read
    immediately before each candidate is judged, so a writer that
    completes ``v{n+1}``, flips the manifest, and starts landing
    ``v{n+2}`` mid-sweep keeps its new in-flight snapshot (no TOCTOU
    between the manifest read and the rmtree). Returns the removed
    directory names.
    """
    import re
    import shutil
    import time

    removed = []
    for name in sorted(os.listdir(path)):
        if not re.fullmatch(r"v\d+", name):
            continue
        full = os.path.join(path, name)
        if not os.path.isdir(full):
            continue
        # TOCTOU guard: judge each candidate against the LIVE manifest,
        # not a pre-sweep snapshot of it.
        m = _read_manifest(path)
        if name in {f"v{v}" for v in m.get("versions", [])}:
            continue
        if name == f"v{int(m.get('current', 0)) + 1}":
            lease = _lease_path(path, int(name[1:]))
            try:
                lease_age = time.time() - os.path.getmtime(lease)
            except OSError:
                lease_age = None  # no lease: fall back to mtime age
            if lease_age is not None:
                if lease_age < min_age_seconds:
                    continue  # live writer holding a fresh lease
                # stale lease: writer died mid-write; reclaim slot+lease
                try:
                    os.remove(lease)
                except OSError:
                    pass
            else:
                newest = max(
                    (os.path.getmtime(os.path.join(dp, f))
                     for dp, _, fs in os.walk(full) for f in fs),
                    default=os.path.getmtime(full))
                if time.time() - newest < min_age_seconds:
                    continue  # presumed in-flight, not crashed
        shutil.rmtree(full, ignore_errors=True)
        removed.append(name)
    return removed
