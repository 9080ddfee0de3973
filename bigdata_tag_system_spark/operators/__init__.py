from bigdata_tag_system_spark.operators.tagging import TagEngine, tag_assignments, tag_profiles
from bigdata_tag_system_spark.operators.merge import merge_profiles, MergeStrategy
from bigdata_tag_system_spark.operators.joins import (
    bucketed_table,
    salted_join,
    write_bucketed,
)

__all__ = [
    "TagEngine",
    "tag_assignments",
    "tag_profiles",
    "merge_profiles",
    "MergeStrategy",
    "salted_join",
    "write_bucketed",
    "bucketed_table",
]
