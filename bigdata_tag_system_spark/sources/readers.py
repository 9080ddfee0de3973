"""Readers: fact tables (Parquet/S3A), rule catalogs (Parquet/JSON/JDBC).

Reference equivalents: ``src/readers/hive_reader.py`` (S3A parquet per
table, date-range partition filters, required-column select) and
``src/readers/rule_reader.py`` (rules ⋈ definitions over JDBC, collected
to driver). JDBC is import-gated — the engine works with a pure-Parquet
catalog (driver testdata has no MySQL; SURVEY §7.3).

Filters/projections are expressed declaratively so Catalyst pushes them
into the scan (``PushedFilters`` / partition pruning) — the reference
builds filter *strings* by hand (``hive_reader.py:87-95``); same result,
but ours composes with the rest of the plan and is injection-safe.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from bigdata_tag_system_spark.rules.model import Rule, load_rules


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing awkward physical types.

    ``events.ts`` is parquet TIMESTAMP(NANOS) — read as long (see
    session.py nanosAsLong) and converted back to a timestamp here so all
    downstream operators see a real timestamp column.
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for f_ in df.schema.fields:
        if f_.name == "ts" and f_.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def read_fact_table(
    spark: SparkSession,
    path: str,
    columns: Sequence[str] | None = None,
    date_col: str | None = None,
    start_date: str | _dt.date | None = None,
    end_date: str | _dt.date | None = None,
    key_col: str | None = None,
    keys: Sequence[Any] | None = None,
    format: str = "parquet",
) -> DataFrame:
    """Read a fact table with pushdown-friendly pruning.

    Mirrors ``hive_reader.read_table_data`` (path scan + date-range filter
    + required-field select, ``hive_reader.py:19-73``) and the key-list
    filter (``hive_reader.py:102``) — all as Column expressions.
    """
    df = spark.read.format(format).load(path)
    if date_col and start_date is not None:
        df = df.where(F.col(date_col) >= F.lit(str(start_date)))
    if date_col and end_date is not None:
        df = df.where(F.col(date_col) <= F.lit(str(end_date)))
    if key_col and keys is not None:
        df = df.where(F.col(key_col).isin(list(keys)))
    if columns:
        df = df.select(*columns)
    return df


def read_rule_catalog(
    spark: SparkSession,
    rules_path: str,
    definitions_path: str | None = None,
    only_active: bool = True,
    format: str = "parquet",
) -> list[Rule]:
    """Load the rule catalog from files; join definitions if separate.

    Replaces the reference's JDBC pushdown subquery
    (``rule_reader.py:48-67``): ``tag_rules ⋈ tag_definition`` becomes a
    broadcast join of two catalog-sized tables, then a *single bounded
    collect* (the catalog is tens-to-thousands of rows — driver-safe by
    construction, unlike collecting fact data).
    """
    rules_df = spark.read.format(format).load(rules_path)
    if definitions_path:
        defs = spark.read.format(format).load(definitions_path)
        keep = [c for c in ("tag_id", "tag_name", "tag_category") if c in defs.columns]
        rules_df = rules_df.join(F.broadcast(defs.select(*keep)), "tag_id", "left")
    rows = [r.asDict() for r in rules_df.collect()]
    return load_rules(rows, only_active=only_active)


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    predicates: list[str] | None = None,
) -> DataFrame:
    """JDBC scan (reference S2/S3, ``rule_reader.py:63-67``).

    ``table`` may be a pushdown subquery: ``"(SELECT ...) t"``. Two
    parallel-read modes (the reference reads single-threaded):

    - ``partition_column`` + bounds + ``num_partitions`` → Spark issues
      one range-sliced query per partition (numeric/date column).
    - ``predicates`` → one arbitrary WHERE clause per partition (e.g.
      hash buckets: ``["mod(id,4)=0", …]``) for non-range keys.

    Requires a JDBC driver jar on the classpath; unavailable in this
    container, so exercised only behind integration flags.
    """
    props = dict(properties or {})
    if predicates:
        return spark.read.jdbc(url, table, predicates=predicates, properties=props)
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in props.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partition_column requires lower_bound, upper_bound, and num_partitions")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: str | StructType | None = None,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read a JSON-Lines corpus (the de-facto LLM training-data
    interchange format) with malformed lines CAPTURED, not dropped.

    ``PERMISSIVE`` mode + an explicit corrupt-record column: a bad line
    yields a row whose data columns are NULL and whose ``corrupt_col``
    holds the raw line, so pipelines can count/quarantine garbage
    instead of silently losing it (``DROPMALFORMED`` changes row counts
    between engines and reruns — never acceptable in a lineage-tracked
    corpus). Always pass ``schema``: schema inference reads the data
    TWICE and locks the result to whatever the sample contained.

    At scale JSONL is a line-splittable text format — parallelism is
    byte-range based (``maxPartitionBytes``), no footer metadata; treat
    it as the INGEST format and convert to parquet in the first hop
    (column pruning/statistics do not exist on JSONL scans).
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_with_corrupt_col(schema, corrupt_col))
    return (
        reader.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )


def _with_corrupt_col(schema: str | StructType, corrupt_col: str):
    """Schema + the corrupt-record column (idempotent, both forms)."""
    if isinstance(schema, StructType):
        return (schema if corrupt_col in schema.fieldNames()
                else StructType(
                    list(schema.fields)
                    + [StructField(corrupt_col, StringType())]))
    names = {
        f.strip().split()[0].strip("`")
        for f in schema.split(",") if f.strip()
    }
    return (schema if corrupt_col in names
            else schema.rstrip() + f", {corrupt_col} string")


def read_csv_corpus(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
    corrupt_col: str = "_corrupt_record",
    header: bool = False,
    sep: str = ",",
) -> DataFrame:
    """Read a CSV corpus with malformed lines CAPTURED, not dropped —
    the CSV face of :func:`read_jsonl_corpus`, same contract: explicit
    schema required (inference = a second full read locked to the
    sample), ``PERMISSIVE`` + corrupt-record column (a type-mismatched
    or wrong-arity line lands as NULL data + the raw line, so garbage
    is counted and quarantined instead of silently lost — row counts
    stay identical across engines and reruns).

    CSV is line-splittable like JSONL (byte-range parallelism, no
    column pruning/statistics), so the same rule applies at scale:
    ingest format only — convert to parquet in the first hop.
    Multi-line quoted fields are NOT enabled (``multiLine`` breaks
    splittability: the whole file becomes one partition); corpora with
    embedded newlines belong in JSONL/parquet.
    """
    return (
        spark.read.schema(_with_corrupt_col(schema, corrupt_col))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .option("header", "true" if header else "false")
        .option("sep", sep)
        .csv(path)
    )
