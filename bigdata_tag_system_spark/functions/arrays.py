"""Array/map expression helpers shared by the tag pipeline.

These are the native replacements for the reference's three Python UDFs
(SURVEY §2.10): ``merge_arrays`` → :func:`merged_tag_array`;
``build_tag_details`` / ``generate_tag_detail`` → :func:`tag_details_json`.
All stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def merged_tag_array(a: Column | str, b: Column | str) -> Column:
    """Sorted distinct union of two int arrays; null-safe.

    Canonical semantics for the reference's divergent pair
    (``tag_merger.py:213`` sorts, ``mysql_writer.py:178`` doesn't).
    """
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    empty = F.array().cast("array<int>")
    return F.array_sort(F.array_distinct(F.array_union(F.coalesce(a, empty), F.coalesce(b, empty))))


def lit_double_array(values) -> Column:
    """A literal ``array<double>`` built with ONE JVM round-trip.

    ``F.array(*[F.lit(x) for x in xs])`` pays one py4j call per element
    (~0.6 ms each): a 24×64 hyperplane set costs ~1.3 s of pure driver
    time PER QUERY BUILD (measured r13; guide §5 — the driver should do
    almost no work). Rendering the same values as one SQL ``array(...)``
    literal and parsing it JVM-side is ~40× faster and bit-exact:
    ``repr(float)`` round-trips IEEE doubles exactly, and the ``D``
    suffix pins the SQL literal type to DOUBLE (verified down to 1 ulp
    in tests). Non-finite values have no SQL literal form, and the
    empty list would type as array<void> — both fall back to the
    per-element path.
    """
    xs = [float(x) for x in values]
    sql = lit_double_array_sql(xs)
    if sql is None:
        return F.array(*[F.lit(x) for x in xs]).cast("array<double>")
    return F.expr(sql)


def lit_double_array_sql(values) -> str | None:
    """The SQL text of :func:`lit_double_array`, for composition into
    LARGER single-parse expressions (r14, guide §5): callers building
    e.g. a per-centroid dot-product array render the whole expression
    as one string and pay ONE py4j round-trip + parse, instead of one
    Column-API call per operator node. Returns ``None`` when the values
    have no exact SQL literal form (non-finite, or empty — which would
    type as array<void>); callers must fall back to the Column path.
    """
    import math

    xs = [float(x) for x in values]
    if not xs or not all(math.isfinite(x) for x in xs):
        return None
    return "array(" + ",".join(repr(x) + "D" for x in xs) + ")"


def tag_details_json(details: Column | str) -> Column:
    """Serialize a ``map<string,struct>`` tag-detail column to JSON text.

    Only at the sink boundary (reference carries JSON strings through the
    whole pipeline, ``tag_merger.py:146-158``).
    """
    details = F.col(details) if isinstance(details, str) else details
    return F.to_json(details)
