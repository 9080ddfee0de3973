from bigdata_tag_system_spark.streaming.rule_stream import (
    session_window_aggregates,
    streaming_exact_dedup,
    streaming_tag_assignments,
    tag_stream_with_rule_reload,
    windowed_event_aggregates,
)
from bigdata_tag_system_spark.streaming.stateful import sessionize_stream
from bigdata_tag_system_spark.streaming.lsh_stream import (
    streaming_minhash_candidates,
)

__all__ = [
    "streaming_tag_assignments",
    "tag_stream_with_rule_reload",
    "windowed_event_aggregates",
    "streaming_exact_dedup",
    "streaming_minhash_candidates",
    "sessionize_stream",
    "session_window_aggregates",
]
