from timeseriesutils_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    session_counts,
    sliding_counts,
    stream_dedup,
    tumbling_counts,
)
