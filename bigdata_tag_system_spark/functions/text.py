"""Text expression helpers (all native Catalyst expressions).

Building blocks for the text-analysis / dedup operators. No reference
equivalent (the reference has no text processing); designed for the
documents table of a training-data pipeline at 100 TB: every helper is a
Column expression that stays JVM-side and vectorized — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Lowercase, collapse whitespace, trim — canonical form for dedup."""
    return F.trim(F.regexp_replace(F.lower(_c(col)), r"\s+", " "))


def portable_hash60(col: Column | str) -> Column:
    """Portable 60-bit string hash: first 15 hex chars of md5, base-16.

    The string analogue of ``sampling.knuth_hash`` (which needs integer
    keys): md5 is byte-identical across engines, so any SQL engine
    reproduces the value exactly — DuckDB:
    ``('0x' || substr(md5(s), 1, 15))::BIGINT``. 15 hex chars = 60 bits
    keeps the value positive and inside int64 in every dialect. Used by
    the ``portable=True`` sketch variants (SimHash, rolling fingerprint)
    so their output is recomputable by an independent oracle;
    the default sketches stay on xxhash64 (one JVM hash call, no hex
    round-trip — cheaper on the 100 TB path where portability is moot).
    """
    return F.conv(F.substring(F.md5(_c(col)), 1, 15), 16, 10).cast("long")


def portable_hash_pair(col: Column | str, modulus: int) -> tuple[Column, Column]:
    """Kirsch–Mitzenmacher double-hash pair (h1, h2) for a power-of-two
    ``modulus``: position ``i`` of a key is ``(h1 + i*h2) & (modulus-1)``.

    Both columns derive from :func:`portable_hash60` — h1 = the low
    log2(modulus) bits, h2 = the next log2(modulus) bits forced ODD
    (an odd stride is coprime to a power-of-two modulus, so the probe
    positions never collapse onto a short cycle). All arithmetic stays
    in small non-negative int64 — no float, no overflow — and an
    external SQL oracle replays it bit-for-bit:
    ``h & (m-1)`` / ``((h >> log2m) & (m-1)) * 2 + 1``. Shared by the
    bloom join prefilter and the Count-Min sketch so one oracle idiom
    covers every position computation.
    """
    if modulus < 2 or modulus & (modulus - 1):
        raise ValueError(f"modulus must be a power of two >= 2, got {modulus}")
    log2m = modulus.bit_length() - 1
    h = portable_hash60(_c(col))
    h1 = h.bitwiseAND(F.lit(modulus - 1))
    h2 = (
        F.shiftrightunsigned(h, log2m).bitwiseAND(F.lit(modulus - 1))
        * F.lit(2) + F.lit(1)
    )
    return h1, h2


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (array<string>)."""
    return F.split(normalize_text(col), " ")


def token_count(col: Column | str) -> Column:
    """Whitespace token count; 0 for empty/null-ish text."""
    t = normalize_text(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, " ")))


def ngrams_from_tokens(tok_col: Column | str, n: int = 2) -> Column:
    """ALL word n-grams (positional, duplicates kept) from a token-array
    column — the repetition-metric unit, vs :func:`shingles_from_tokens`
    which dedups for set-similarity. Same windowing: docs shorter than
    ``n`` yield their whole text as the single gram.
    """
    toks = _c(tok_col)
    sz = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(sz - n, F.lit(0)))
    return F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))


# PII surface patterns — the lookahead-free subset shared by Java regex
# and RE2 so the same pattern runs in Spark, DuckDB, and most scanners.
# Deliberately precision-leaning (a training-data scrub wants few false
# redactions); extend per deployment.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\+?\d[\d -]{7,14}\d\b",
}

# redaction must run longest-surface-first: emails contain dot-runs an
# IP pattern could clip, and IPs contain digit-runs the phone pattern
# could clip — this order leaves each placeholder intact
PII_REDACTION_ORDER: tuple[str, ...] = ("email", "ipv4", "phone")


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII match counts (one ``regexp_count`` each, JVM-side)."""
    c = _c(col)
    return {kind: F.regexp_count(c, F.lit(pat)) for kind, pat in PII_PATTERNS.items()}


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with a ``<KIND>`` placeholder.

    A chain of ``regexp_replace`` in :data:`PII_REDACTION_ORDER` —
    still one projection, whole-stage codegen'd; at 100 TB this is a
    map-only pass with zero shuffle.
    """
    out = _c(col)
    for kind in PII_REDACTION_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def shingles_from_tokens(tok_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles from an already-materialized token
    array column (array<string>).

    Slide a window of ``n`` over the token array with
    ``transform(sequence(...))``; shorter docs yield their whole text as
    the single shingle.

    The token array MUST be a real column (projected in a prior select),
    not an inline ``tokens(text)`` expression: higher-order-function
    lambdas re-evaluate captured non-trivial expressions per array
    element, so inlining the regex tokenizer here costs ~|shingles|×
    regex calls per row (measured 7× slower end-to-end at sf0.1).
    """
    toks = _c(tok_col)
    sz = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(sz - n, F.lit(0)))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    return F.array_distinct(sh)


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (array<string>) — dedup unit.

    Single-expression form. The token array is LET-BOUND through a
    1-element-array transform: the outer lambda's variable materializes
    ``tokens(col)`` exactly once per row, and every reference inside
    :func:`shingles_from_tokens`'s window lambda is then a cheap
    variable lookup — inlining the tokenizer expression directly would
    re-run the regex split once per shingle index (HOF lambdas
    re-evaluate captured non-trivial expressions per element; measured
    7× end-to-end on the fingerprint queries). Column-expression
    contexts that can't stage a projection get the same guarantee the
    two-phase ``.select(tokens(c).alias("_t"))`` form gives operators.
    """
    bound = F.transform(F.array(tokens(col)),
                        lambda t: shingles_from_tokens(t, n))
    return F.element_at(bound, 1)


# URL surface pattern (lookahead-free subset shared by Java regex and
# RE2/DuckDB): scheme + host; the capture group isolates the domain for
# blocklist filtering and per-domain stats.
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?:/[^\s]*)?"
URL_DOMAIN_GROUP_PATTERN = r"https?://([A-Za-z0-9.-]+)"


def extract_url_domains(col: Column | str) -> Column:
    """All URL domains in the text (array<string>, duplicates kept) —
    one ``regexp_extract_all``, JVM-side."""
    return F.regexp_extract_all(_c(col), F.lit(URL_DOMAIN_GROUP_PATTERN), 1)


# Pre-tokenization pattern of BPE-style tokenizers, simplified to the
# lookahead-free subset shared by Java regex and RE2: letter runs, digit
# runs, and punctuation runs each become one piece.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count over lowercased text.

    Deterministic regex stand-in for a BPE tokenizer's pre-tokenization
    pass — counts letter runs, digit runs, and punctuation runs. A real
    BPE vocab merge step would slot in as a Pandas UDF downstream; this
    JVM-side count is the scale-friendly budget/quality signal.
    """
    return F.regexp_count(F.lower(_c(col)), F.lit(BPE_ISH_PATTERN))


def char_ngrams(col: Column | str, n: int = 5) -> Column:
    """Distinct character n-grams of normalized text (array<string>)."""
    t = normalize_text(col)
    ln = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(ln - n + 1, F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(t, i, n)))
