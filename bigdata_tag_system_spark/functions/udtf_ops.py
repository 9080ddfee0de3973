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


class JsonCols:
    """POLYMORPHIC UDTF (Spark 4 ``analyze()``): project requested keys
    out of a JSON string column as real named COLUMNS, with the output
    schema computed AT PLAN TIME from the literal key arguments —
    ``json_cols(props, 'k', 'src')`` yields columns ``k, src``. The
    schema-on-demand pattern a semi-structured pipeline wants when the
    key set is query-specific: downstream operators see typed named
    columns (prunable, codegen-visible) instead of repeated
    ``get_json_object`` calls or an opaque map.

    ``analyze`` receives AnalyzeArgument metadata for every call arg;
    non-literal keys are rejected LOUDLY (the schema cannot depend on
    data). Values surface as strings (JSON scalars rendered compactly,
    nested values re-serialized); missing keys and malformed JSON yield
    NULLs — the lenient semi-structured contract, matched by the SQL
    oracle's json_extract behavior.
    """

    @staticmethod
    def analyze(*args):
        import json as _json

        from pyspark.sql.types import StringType, StructField, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if len(args) < 2:
            raise ValueError(
                "json_cols requires a JSON column and at least one "
                "literal key name")
        keys = []
        for a in args[1:]:
            if a.value is None or not isinstance(a.value, str):
                raise ValueError(
                    "json_cols key names must be string LITERALS — the "
                    "output schema is fixed at plan time")
            keys.append(a.value)
        if len(set(keys)) != len(keys):
            raise ValueError(f"duplicate key names: {keys}")
        return AnalyzeResult(schema=StructType(
            [StructField(k, StringType()) for k in keys]))

    def eval(self, payload, *keys):
        import json

        try:
            d = json.loads(payload) if payload is not None else {}
            if not isinstance(d, dict):
                d = {}
        except (ValueError, TypeError):
            d = {}

        def render(v):
            if v is None:
                return None
            if isinstance(v, str):
                return v
            if isinstance(v, bool):
                return "true" if v else "false"
            if isinstance(v, (int, float)):
                return json.dumps(v)
            return json.dumps(v, sort_keys=True, separators=(",", ":"))

        yield tuple(render(d.get(k)) for k in keys)


def register_json_cols(spark) -> None:
    """Idempotently register ``json_cols`` (polymorphic UDTF)."""
    from pyspark.sql.functions import udtf as _udtf

    spark.udtf.register("json_cols", _udtf(JsonCols))
