from bigdata_tag_system_spark.functions.arrays import merged_tag_array, tag_details_json
from bigdata_tag_system_spark.functions.text import (
    char_ngrams,
    normalize_text,
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
]
