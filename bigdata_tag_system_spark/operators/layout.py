"""Space-filling-curve data layout (Z-order clustering).

At 100 TB the dominant cost of a selective query is the files it CANNOT
skip. Sorting by one column gives perfect min/max pruning on that column
and none on any other; interleaving the bits of several columns into a
Morton (Z-order) value and range-sorting by it gives every interleaved
column locality, so parquet min/max stats prune multi-dimensional box
predicates — the technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is closed-form 64-bit integer bit arithmetic (shift /
mask / or), reproducible in any engine — no UDF, no lookup tables; the
oracle harness recomputes z-values in plain SQL.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_value(cols: Sequence[Column | str], bits: int = 16) -> Column:
    """Morton code interleaving the low ``bits`` bits of each column.

    Bit ``b`` of column ``i`` lands at position ``b · ncols + i`` — the
    classic round-robin interleave. Total width ``bits · ncols`` must
    fit a signed 64-bit value (≤ 62 keeps the sign bit clear). Columns
    are masked to ``bits`` bits first, so callers quantize (bucketize /
    mod) wider domains down; NULLs propagate to a NULL z-value, which
    callers should coalesce or filter. The expression is a flat OR of
    ``bits · ncols`` shift/mask terms — whole-stage-codegen folds it
    into straight-line JVM code, no Python anywhere.
    """
    ncols = len(cols)
    if ncols < 2:
        raise ValueError(f"zorder needs >= 2 columns, got {ncols}")
    if bits * ncols > 62:
        raise ValueError(
            f"bits * ncols must be <= 62 to fit int64, got {bits}*{ncols}")
    mask = (1 << bits) - 1
    out = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        v = (F.col(c) if isinstance(c, str) else c).cast("long")
        v = v.bitwiseAND(F.lit(mask))
        for b in range(bits):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(bit, b * ncols + i))
    return out


def cluster_zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "z",
) -> DataFrame:
    """Attach the z-value and range-sort the frame by it.

    ``repartitionByRange`` samples the z distribution and assigns
    contiguous z ranges to partitions — each output file then covers a
    small hyper-rectangle of the interleaved columns, which is exactly
    what makes parquet min/max stats selective on ALL of them. Use as
    the step before a partitioned write; readers need no special
    support (pruning happens in the scan from ordinary stats).
    """
    z = zorder_value(cols, bits=bits)
    return df.withColumn(out_col, z).repartitionByRange(out_col)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the z-value of ``cols`` (the z column
    itself is dropped — it exists only to drive row placement)."""
    clustered = cluster_zorder(df, cols, bits=bits, out_col="__z")
    clustered.sortWithinPartitions("__z").drop("__z") \
        .write.mode(mode).parquet(path)


def zone_map_report(
    spark,
    dir_path: str,
    zone_col: str,
    lo,
    hi,
    group_pattern: str = r"bucket=(\d+)",
) -> DataFrame:
    """Per-layout-group zone-map audit from parquet FOOTERS only — the
    file-skipping effectiveness report a re-clustering job is graded
    by: for each layout group (e.g. each ``bucket=N`` directory), the
    footer min/max of ``zone_col``, the row count, and whether a scan
    with predicate ``zone_col BETWEEN lo AND hi`` can SKIP the group
    entirely (no zone overlap — the decision parquet readers and
    Iceberg/Delta data-skipping make from exactly these stats).

    No row data is ever read: the driver lists file paths (a
    metadata-sized relation; a cluster deployment lists via the
    catalog/FS API the same way), and executors open ONLY the parquet
    footer of each file via ``mapInPandas`` — so auditing a petabyte
    layout costs one footer read per file. Stats are exact for integer
    columns (parquet int64 min/max carry no truncation), which is what
    makes the report independently replayable by an external oracle
    from the source rows.
    """
    import os
    import re as _re

    files = []
    for root, _dirs, fnames in os.walk(dir_path):
        for f in fnames:
            if f.endswith(".parquet"):
                files.append(os.path.join(root, f))
    if not files:
        raise ValueError(
            f"no parquet files under {dir_path!r} (listing walks the "
            "LOCAL filesystem only — on a cluster, list paths via the "
            "catalog/FS API and feed them to the footer scan directly)")
    for p in files:
        if not _re.search(group_pattern, p):
            raise ValueError(
                f"file {p!r} does not match group pattern {group_pattern!r}")
    # the mapInPandas output schema types zmin/zmax as long, and the
    # "exact stats" contract the docstring states only holds for
    # parquet integer physical types — enforce it from the first
    # footer instead of letting string/date stats fail opaquely or
    # coerce wrongly downstream
    import pyarrow.parquet as _pq

    _md = _pq.ParquetFile(sorted(files)[0]).metadata
    _names = [_md.schema.column(i).name for i in range(_md.num_columns)]
    if zone_col not in _names:
        raise ValueError(
            f"zone column {zone_col!r} not in parquet schema {_names}")
    _ptype = _md.schema.column(_names.index(zone_col)).physical_type
    if _ptype not in ("INT32", "INT64"):
        raise ValueError(
            f"zone_map_report requires an integer zone column (parquet "
            f"physical type INT32/INT64) — {zone_col!r} is {_ptype}; "
            "string/date/float stats can be truncated or ordered "
            "differently in footers and would not be exact")
    fdf = spark.createDataFrame(
        [(p,) for p in sorted(files)], "path string")

    def _footer_stats(it):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in it:
            rows = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = [md.schema.column(i).name
                         for i in range(md.num_columns)]
                ci = names.index(zone_col)
                mns, mxs = [], []
                for g in range(md.num_row_groups):
                    st = md.row_group(g).column(ci).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            f"{p!r} row group {g} carries no min/max "
                            f"stats for {zone_col!r}")
                    mns.append(st.min)
                    mxs.append(st.max)
                rows.append((p, md.num_rows, min(mns), max(mxs)))
            yield pd.DataFrame(
                rows, columns=["path", "n_rows", "zmin", "zmax"])

    per_file = fdf.mapInPandas(
        _footer_stats,
        "path string, n_rows long, zmin long, zmax long")
    grp = F.regexp_extract("path", group_pattern, 1).cast("long")
    return (
        per_file.groupBy(grp.alias("bucket"))
        .agg(F.sum("n_rows").alias("n_rows"),
             F.min("zmin").alias("zone_min"),
             F.max("zmax").alias("zone_max"))
        .select(
            "bucket", "n_rows", "zone_min", "zone_max",
            ((F.col("zone_max") < F.lit(lo))
             | (F.col("zone_min") > F.lit(hi)))
            .cast("int").alias("skip"))
        .orderBy("bucket")
    )
