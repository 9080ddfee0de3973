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


def tag_details_json(details: Column | str) -> Column:
    """Serialize a ``map<string,struct>`` tag-detail column to JSON text.

    Only at the sink boundary (reference carries JSON strings through the
    whole pipeline, ``tag_merger.py:146-158``).
    """
    details = F.col(details) if isinstance(details, str) else details
    return F.to_json(details)
