from opc2mongodb_spark.streaming.pipeline import (
    normalize_stream,
    session_activity,
    sliding_avg,
    streaming_last_value,
    tumbling_counts,
    with_late_data_policy,
)
from opc2mongodb_spark.streaming.sinks import CurrentValuesStore, upsert_query

__all__ = [
    "normalize_stream",
    "session_activity",
    "sliding_avg",
    "streaming_last_value",
    "tumbling_counts",
    "with_late_data_policy",
    "CurrentValuesStore",
    "upsert_query",
]
