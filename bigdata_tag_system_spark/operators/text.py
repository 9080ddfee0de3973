"""Text-analysis operators over a documents table.

Training-data-pipeline surface (no reference equivalent — the reference
has no text processing; this is the 100 TB scale extension mandated by the
build brief): language ID, quality scoring, token stats, fingerprinting.
All native expressions — at 100 TB these run inside whole-stage codegen
with zero Python cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_tag_system_spark.functions.text import normalize_text, token_count, tokens

# Tiny per-language stopword profiles for the n-gram/stopword heuristic.
# Deliberately small: language ID at scale works off the highest-frequency
# function words; extend per deployment.
_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "es", "los"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "les", "des", "que"],
    "de": ["der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"],
}


def language_scores(col: Column | str) -> Column:
    """map<lang, double>: fraction of tokens matching each language profile."""
    toks = tokens(col)
    total = F.greatest(F.size(toks), F.lit(1))
    entries = [
        F.struct(
            F.lit(lang).alias("key"),
            (F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))) / total
             ).alias("value"),
        )
        for lang, words in _STOPWORDS.items()
    ]
    return F.map_from_entries(F.array(*entries))


def detect_language(col: Column | str, default: str = "und") -> Column:
    """Best-scoring language, or ``default`` when nothing matches.

    Heuristic stopword vote — the deterministic, JVM-side baseline; a
    model-based detector would slot in as a Pandas UDF behind the same
    column contract.
    """
    scores = language_scores(col)
    langs = list(_STOPWORDS)
    best = F.greatest(*[scores[l] for l in langs])
    pick = F.coalesce(
        *[F.when(scores[l] == best, F.lit(l)) for l in langs]
    )
    return F.when(best > 0, pick).otherwise(F.lit(default))


def quality_features(col: Column | str) -> dict[str, Column]:
    """Deterministic quality signals: lengths, ratios, repetition."""
    t = normalize_text(col)
    raw = _c_raw(col)
    n_chars = F.length(raw)
    n_tokens = token_count(col)
    toks = tokens(col)
    distinct_ratio = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)) / n_tokens
    ).otherwise(F.lit(0.0))
    alpha = F.length(F.regexp_replace(t, r"[^a-z]", ""))
    alpha_ratio = F.when(F.length(t) > 0, alpha / F.length(t)).otherwise(F.lit(0.0))
    digit = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    digit_ratio = F.when(F.length(t) > 0, digit / F.length(t)).otherwise(F.lit(0.0))
    mean_token_len = F.when(n_tokens > 0, (F.length(t) - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "distinct_token_ratio": distinct_ratio,
        "alpha_ratio": alpha_ratio,
        "digit_ratio": digit_ratio,
        "mean_token_len": mean_token_len,
    }


def quality_score(col: Column | str) -> Column:
    """[0,1] composite quality score (documented, deterministic weights).

    score = 0.4·min(n_tokens/100, 1) + 0.3·distinct_token_ratio +
            0.3·alpha_ratio
    """
    f = quality_features(col)
    return (
        0.4 * F.least(f["n_tokens"] / 100.0, F.lit(1.0))
        + 0.3 * f["distinct_token_ratio"]
        + 0.3 * f["alpha_ratio"]
    )


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(col))


def rolling_fingerprint(col: Column | str, n: int = 8) -> Column:
    """Winnowing-style fingerprint: min xxhash64 over word n-gram windows.

    A cheap near-dup-stable 64-bit sketch (two docs differing by a little
    tail text often share the min-hash window).
    """
    from bigdata_tag_system_spark.functions.text import word_shingles

    return F.array_min(F.transform(word_shingles(col, n), lambda s: F.xxhash64(s)))


def analyze_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set to a documents table."""
    feats = quality_features(text_col)
    return df.select(
        "*",
        feats["n_tokens"].alias("n_tokens"),
        feats["distinct_token_ratio"].alias("distinct_token_ratio"),
        feats["alpha_ratio"].alias("alpha_ratio"),
        quality_score(text_col).alias("quality_score"),
        detect_language(text_col).alias("detected_lang"),
        fingerprint(text_col).alias("fingerprint"),
    )


def _c_raw(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: (id, term, tfidf, rank).

    tf = term count within the document; idf = ln(N / df) over the
    corpus (natural log, df = number of documents containing the term) —
    the classic raw-tf formulation, chosen because it is exactly
    reproducible in any SQL engine for cross-checking. Ties break on the
    term string so the top-k is deterministic.

    Plan shape at scale: one explode → two map-side-combined hash
    aggregations (per-(doc, term) tf; per-term df) → broadcast-joinable
    df table only if small, else a shuffle join keyed by term → one
    window partitioned by document for the top-k. No driver-side vocab,
    no collect; the corpus document count is a scalar agg folded in via
    a cross join of a 1-row frame (Spark broadcasts it).
    """
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(n_docs)
        .select(
            F.col(id_col),
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
