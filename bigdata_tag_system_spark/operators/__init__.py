from bigdata_tag_system_spark.operators.joins import (
    adaptive_join,
    bloom_filter_bits,
    bloom_flag,
    bloom_prefilter,
    bucketed_table,
    join_delta,
    salted_join,
    skew_stats,
    write_bucketed,
)
from bigdata_tag_system_spark.operators.merge import MergeStrategy, merge_profiles
from bigdata_tag_system_spark.operators.quality import key_skew_report
from bigdata_tag_system_spark.operators.sampling import pack_concat_chunks
from bigdata_tag_system_spark.operators.sketches import hll_register_sketch
from bigdata_tag_system_spark.operators.tagging import (
    TagEngine,
    tag_assignments,
    tag_profiles,
)

__all__ = [
    "TagEngine",
    "tag_assignments",
    "tag_profiles",
    "merge_profiles",
    "MergeStrategy",
    "salted_join",
    "adaptive_join",
    "skew_stats",
    "write_bucketed",
    "bucketed_table",
    "bloom_filter_bits",
    "bloom_flag",
    "bloom_prefilter",
    "join_delta",
    "key_skew_report",
    "pack_concat_chunks",
    "hll_register_sketch",
]
