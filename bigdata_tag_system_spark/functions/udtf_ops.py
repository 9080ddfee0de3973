"""Python UDTF (Spark 4 `@udtf`) — the one-row→many-rows escape hatch,
demonstrated on fixed-window text chunking.

This is deliberately the SLOW-PATH twin of the native
``operators/text.py:chunk_documents``: same row contract, implemented
as a user-defined table function so the §2.10 surface (UDF → Pandas
UDF → UDTF) is complete and tested. Production chunking stays on the
native expressions (JVM, whole-stage codegen); reach for a UDTF only
when per-row Python logic genuinely cannot be expressed as columns —
e.g. calling a real tokenizer library — and then note the plan cost:
each UDTF call is a Python worker round-trip (`BatchEvalPythonUDTF`
node, no codegen through it).

Determinism contract: output is a pure function of the input row (no
clock, no RNG, no state across rows), so an external SQL oracle
replays it exactly.
"""

from __future__ import annotations

import hashlib

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, n_tokens int, chunk_md5 string")
class ChunkText:
    """Yield fixed 32-token windows of the normalized text with an
    md5 identity per chunk (the last window may be short)."""

    def eval(self, text: str):  # noqa: D102 — contract in class doc
        if text is None:
            return
        norm = " ".join(text.lower().split())
        if not norm:
            return
        toks = norm.split(" ")
        size = 32
        for i in range(0, len(toks), size):
            chunk = " ".join(toks[i:i + size])
            yield (
                i // size,
                len(toks[i:i + size]),
                hashlib.md5(chunk.encode()).hexdigest(),
            )


def register(spark) -> None:
    """Idempotently register ``chunk_text`` for SQL lateral use."""
    spark.udtf.register("chunk_text", ChunkText)
