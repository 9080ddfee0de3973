from bigdata_tag_system_spark.streaming.rule_stream import (
    streaming_exact_dedup,
    streaming_tag_assignments,
    windowed_event_aggregates,
)
from bigdata_tag_system_spark.streaming.stateful import sessionize_stream

__all__ = [
    "streaming_tag_assignments",
    "windowed_event_aggregates",
    "streaming_exact_dedup",
    "sessionize_stream",
]
