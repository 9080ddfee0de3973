from bigdata_tag_system_spark.functions.arrays import merged_tag_array, tag_details_json
from bigdata_tag_system_spark.functions.text import (
    char_ngrams,
    ngrams_from_tokens,
    normalize_text,
    pii_counts,
    redact_pii,
    token_count,
    tokens,
    word_shingles,
)

__all__ = [
    "merged_tag_array",
    "tag_details_json",
    "normalize_text",
    "tokens",
    "token_count",
    "word_shingles",
    "char_ngrams",
    "ngrams_from_tokens",
    "pii_counts",
    "redact_pii",
]
