from .ops import (
    foreach_batch_merge,
    read_parquet_stream,
    run_available_now,
    session_aggregation,
    stream_dedup,
    windowed_aggregation,
)

__all__ = [
    "read_parquet_stream",
    "windowed_aggregation",
    "session_aggregation",
    "stream_dedup",
    "foreach_batch_merge",
    "run_available_now",
]
