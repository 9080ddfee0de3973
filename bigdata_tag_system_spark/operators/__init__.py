from bigdata_tag_system_spark.operators.tagging import TagEngine, tag_assignments, tag_profiles
from bigdata_tag_system_spark.operators.merge import merge_profiles, MergeStrategy

__all__ = [
    "TagEngine",
    "tag_assignments",
    "tag_profiles",
    "merge_profiles",
    "MergeStrategy",
]
