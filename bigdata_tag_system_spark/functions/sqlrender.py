"""Helpers for single-parse SQL rendering of operator segments (r14).

Guide §5: every Column-API node costs a py4j round-trip (~0.6 ms
driver-blocked), so chatty operator builds are rendered as ONE
``spark.sql`` statement per checkpoint segment. Two rules keep those
statements safe on Spark 4.1:

- **Bind each DataFrame parameter at most once.** Two references of
  the same parameter (or a multi-referenced CTE) share attribute ids
  across join/union branches, which trips Catalyst's constraint
  rewrites (``key not found`` in ``AttributeMap`` inside
  ``UnionBase.rewriteConstraints``). Extra references go through
  :func:`fresh_ids`, which mints new expression ids with a same-name
  alias projection — the ``_cogroup_asof_prologue`` trick.
- **Reuse points stay on the DataFrame API** (its analyzer
  deduplicates relations), SQL renders only linear chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fresh_ids(df: DataFrame) -> DataFrame:
    """A zero-cost projection that re-mints every column's expression
    id, so the relation can appear as a SECOND ``spark.sql`` parameter
    next to the original (see module docstring)."""
    return df.select(*[F.col(c).alias(c) for c in df.columns])


def ident(name: str) -> str:
    """Backtick-quote an identifier for embedding in rendered SQL."""
    return "`" + name.replace("`", "``") + "`"
