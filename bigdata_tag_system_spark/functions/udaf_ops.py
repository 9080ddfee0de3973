"""User-defined AGGREGATE surfaces: grouped-agg pandas UDAF and
SQL-language (``CREATE FUNCTION``) UDFs.

The reference engine exposes scalar UDF registration only (SURVEY
§2.10: "No UDAF" — reference ``udf_registry`` has no aggregate hook);
this module completes the engine's Python-executor ladder
(row-UDF-avoided → pandas_udf → mapInPandas/mapInArrow → UDTF →
UDTF-with-analyze → Python DataSource) with the two rungs a user
porting an aggregation would reach for first:

* :func:`grouped_weighted_geomean` — a grouped-agg pandas UDF
  (``pandas_udf`` over whole-group Series, Arrow-batched) computing a
  per-group WEIGHTED GEOMETRIC MEAN, an aggregate no Spark built-in
  covers in one call. The UDAF participates in a normal
  ``groupBy().agg()`` — partial aggregation is NOT available to
  grouped-agg pandas UDFs (whole groups ship to one task), which is
  exactly why the docstring of the SQL twin below matters at 100 TB.
* :func:`weighted_geomean_native` — the same aggregate as a pure
  built-in expression (``exp(sum(w*ln(v))/sum(w))``): map-side partial
  aggregation, whole-stage codegen, no Python. The production path;
  the UDAF exists to certify the surface and for aggregates that
  genuinely need numpy/scipy per group.
* :func:`register_sql_udfs` — Spark 4 SQL-language UDFs
  (``CREATE FUNCTION ... RETURNS ... RETURN expr`` and the
  table-valued ``RETURNS TABLE`` form). Declarative bodies are inlined
  into the plan by Catalyst (no Python worker, full codegen), making
  them the warehouse-interop complement of
  ``rules.compiler.rule_to_sql``.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def _weighted_geomean_udaf(v: pd.Series, w: pd.Series) -> float:
    # whole-group Series arrive in one Arrow batch; numpy reduces them
    # C-side. exp(sum(w*ln(v))/sum(w)) == prod(v**w)**(1/sum(w)) without
    # the overflow.
    import numpy as np

    lv = np.log(v.to_numpy(dtype="float64"))
    wt = w.to_numpy(dtype="float64")
    tot = float(wt.sum())
    if tot <= 0.0:
        return None  # undefined without weight mass (arrives as SQL NULL)
    return float(np.exp(float((lv * wt).sum()) / tot))


def grouped_weighted_geomean(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    out_col: str = "w_geomean",
) -> DataFrame:
    """Per-group weighted geometric mean via a grouped-agg pandas UDAF.

    Requires ``value_col`` > 0 (log-domain). Scale note: grouped-agg
    pandas UDFs ship every group's rows to a single task with NO
    map-side partial aggregation — fine for bounded-cardinality group
    keys (this call's intended shape), wrong for per-user keys at
    100 TB; use :func:`weighted_geomean_native` there.
    """
    return df.groupBy(group_col).agg(
        _weighted_geomean_udaf(F.col(value_col), F.col(weight_col))
        .alias(out_col))


def weighted_geomean_native(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    out_col: str = "w_geomean",
) -> DataFrame:
    """Built-in-expression twin of :func:`grouped_weighted_geomean`:
    one whole-stage-codegen'd aggregate with map-side partials."""
    w = F.col(weight_col).cast("double")
    num = F.sum(w * F.log(F.col(value_col).cast("double")))
    den = F.sum(w)
    return df.groupBy(group_col).agg(
        F.exp(num / den).alias(out_col))


_SQL_UDF_SCALAR = """
CREATE OR REPLACE TEMPORARY FUNCTION disc_price(
    ep DOUBLE, disc DOUBLE, tax DOUBLE)
RETURNS DOUBLE
RETURN ep * (1 - disc) * (1 + tax)
"""

_SQL_UDF_BAND = """
CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE)
RETURNS STRING
RETURN CASE WHEN q < 10 THEN 'low'
            WHEN q < 30 THEN 'mid'
            ELSE 'high' END
"""


def register_sql_udfs(spark: SparkSession) -> None:
    """Register the SQL-language scalar UDFs (idempotent).

    Spark 4 inlines the ``RETURN`` expression into the calling plan at
    analysis time — the registered functions carry zero runtime cost
    over writing the expression inline, and zero Python-worker traffic.
    """
    spark.sql(_SQL_UDF_SCALAR)
    spark.sql(_SQL_UDF_BAND)


def register_sql_table_udf(spark: SparkSession) -> None:
    """Register a TABLE-VALUED SQL UDF (``RETURNS TABLE``): integer
    band edges for :func:`register_sql_udfs`'s ``qty_band``, generated
    declaratively so a join against it stays a broadcast of 3 rows."""
    spark.sql("""
        CREATE OR REPLACE TEMPORARY FUNCTION qty_bands()
        RETURNS TABLE(band STRING, lo DOUBLE, hi DOUBLE)
        RETURN SELECT * FROM VALUES
            ('low', CAST(0 AS DOUBLE), CAST(10 AS DOUBLE)),
            ('mid', CAST(10 AS DOUBLE), CAST(30 AS DOUBLE)),
            ('high', CAST(30 AS DOUBLE), CAST(1e9 AS DOUBLE))
            AS t(band, lo, hi)
    """)
