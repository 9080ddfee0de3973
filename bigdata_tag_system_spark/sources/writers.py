"""Sinks: Parquet, Parquet-merge (upsert-by-rewrite), and JDBC upsert.

The reference's headline sink is a per-partition batched
``INSERT … ON DUPLICATE KEY UPDATE`` into MySQL via ``foreachPartition`` +
pymysql (``src/writers/mysql_writer.py:191-290``; batches of 2000 at :211,
``repartition(min(8, n/8000), user_id)`` at :269-271 to cap connection
count). The same physical pattern is kept here, generalized:

- DBAPI-agnostic connection factory (pymysql, sqlite3, psycopg2, …) so the
  sink is actually testable in-container (sqlite) and portable in prod.
- Dialect-pluggable upsert SQL (MySQL ``ON DUPLICATE KEY UPDATE``,
  standard ``ON CONFLICT … DO UPDATE``).
- Connection-count control stays sink-side policy: ``repartition(p, key)``
  where p = min(max_partitions, rows/rows_per_partition) — same envelope
  as the reference, but the row count comes from a cheap ``observe``
  rather than a full extra ``count()`` job when provided.

For file-based result stores (the driver environment has no MySQL) the
idiomatic replacement is :func:`parquet_merge_upsert` — read existing,
full-outer merge on key (last-writer-wins + optional array-union), rewrite.
On Delta-capable clusters this maps 1:1 onto ``MERGE INTO``.
"""

from __future__ import annotations

from typing import Callable, Iterable, Sequence

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", partition_by: Sequence[str] | None = None) -> None:
    """Plain parquet sink (reference S6, ``test_data_generator.py:101``)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


# ---------------------------------------------------------------------------
# JDBC upsert (reference S8)
# ---------------------------------------------------------------------------

def _upsert_sql(dialect: str, table: str, cols: Sequence[str], key_cols: Sequence[str]) -> str:
    collist = ", ".join(cols)
    placeholders = ", ".join(["%s" if dialect == "mysql" else "?"] * len(cols))
    update_cols = [c for c in cols if c not in key_cols]
    if dialect == "mysql":
        updates = ", ".join(f"{c} = VALUES({c})" for c in update_cols)
        return f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) ON DUPLICATE KEY UPDATE {updates}"
    # standard / sqlite / postgres
    keylist = ", ".join(key_cols)
    updates = ", ".join(f"{c} = excluded.{c}" for c in update_cols)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
        f"ON CONFLICT ({keylist}) DO UPDATE SET {updates}"
    )


def jdbc_upsert(
    df: DataFrame,
    connection_factory: Callable[[], object],
    table: str,
    key_cols: Sequence[str],
    batch_size: int = 2000,
    max_partitions: int = 8,
    rows_per_partition: int = 8000,
    dialect: str = "mysql",
    approx_rows: int | None = None,
) -> None:
    """Idempotent per-partition batched upsert (last-writer-wins per key).

    ``connection_factory`` must be picklable (top-level function / partial)
    — it runs inside executors. Matches reference envelope:
    batch 2000 (``mysql_writer.py:211``), ≤8 partitions hashed by key
    (``mysql_writer.py:269-271``) so the database sees a bounded number of
    concurrent connections no matter the cluster size.
    """
    cols = list(df.columns)
    sql = _upsert_sql(dialect, table, cols, list(key_cols))

    n = approx_rows if approx_rows is not None else df.count()
    parts = max(1, min(max_partitions, n // max(1, rows_per_partition) or 1))
    # always a real repartition: coalesce(1) would propagate up past the
    # previous shuffle boundary and run the whole upstream pipeline in
    # one task; the shuffle is negligible next to a DB-bound sink
    out = df.repartition(parts, *key_cols)

    def _write_partition(rows: Iterable[Row]) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []
            for row in rows:
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batch_size:
                    cur.executemany(sql, batch)
                    conn.commit()
                    batch = []
            if batch:
                cur.executemany(sql, batch)
                conn.commit()
        finally:
            conn.close()  # type: ignore[attr-defined]

    out.foreachPartition(_write_partition)


def read_store_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a parquet store; None ONLY when the path genuinely doesn't
    exist. Any other read failure (corrupt footer, permissions, transient
    object-store error) propagates — treating it as "empty store" would
    make the next merge-rewrite silently drop every stored row.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        cond = getattr(exc, "getErrorClass", lambda: "")() or ""
        if "PATH_NOT_FOUND" in cond or "Path does not exist" in str(exc):
            return None
        raise


# ---------------------------------------------------------------------------
# Parquet merge-upsert (file-based result store; Delta MERGE INTO analogue)
# ---------------------------------------------------------------------------

def parquet_merge_upsert(
    spark: SparkSession,
    new: DataFrame,
    path: str,
    key_cols: Sequence[str],
    array_union_cols: Sequence[str] = (),
) -> DataFrame:
    """Upsert ``new`` into the parquet store at ``path``.

    Full-outer join on key (spec §4.3 semantics): rows only in the store
    survive, rows only in ``new`` insert, conflicts resolve last-writer-wins
    except ``array_union_cols`` which set-union (sorted, distinct) —
    the scenario-2/6 merge semantics (SURVEY §7.3). Returns the merged
    DataFrame; caller writes it (kept separate for testability — parquet
    can't be overwritten while being read).
    """
    existing = read_store_if_exists(spark, path)
    if existing is None:
        return new

    keys = list(key_cols)
    n = new.alias("n")
    e = existing.alias("e")
    joined = n.join(e, on=keys, how="full_outer")
    out_cols: list = [F.col(k) for k in keys]
    for c in new.columns:
        if c in keys:
            continue
        nc, ec = F.col(f"n.{c}"), F.col(f"e.{c}") if c in existing.columns else F.lit(None)
        if c in array_union_cols:
            merged = F.when(
                nc.isNotNull() & ec.isNotNull(),
                F.array_sort(F.array_distinct(F.array_union(nc, ec))),
            ).otherwise(F.coalesce(nc, ec))
        else:
            merged = F.coalesce(nc, ec)  # last-writer-wins: new beats stored
        out_cols.append(merged.alias(c))
    return joined.select(*out_cols)
