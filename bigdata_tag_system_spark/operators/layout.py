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
