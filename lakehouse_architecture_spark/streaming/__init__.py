from lakehouse_architecture_spark.streaming.incremental import (
    incremental_file_source,
    run_available_now,
    sessionized_counts,
    streaming_dedup,
    windowed_counts,
)

__all__ = [
    "incremental_file_source",
    "run_available_now",
    "windowed_counts",
    "sessionized_counts",
    "streaming_dedup",
]
