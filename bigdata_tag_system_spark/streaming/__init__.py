from bigdata_tag_system_spark.streaming.rule_stream import (
    streaming_tag_assignments,
    windowed_event_aggregates,
)

__all__ = ["streaming_tag_assignments", "windowed_event_aggregates"]
