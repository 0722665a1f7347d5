from batch_public_spark.streaming.ops import (
    dedup_within_watermark,
    interval_join_pairs,
    read_events_stream,
    run_available_now,
    run_foreach_batch,
    run_incremental,
    running_max_per_key,
    session_counts,
    sliding_counts,
    tumbling_counts,
)

__all__ = [
    "dedup_within_watermark",
    "interval_join_pairs",
    "read_events_stream",
    "run_available_now",
    "run_foreach_batch",
    "run_incremental",
    "running_max_per_key",
    "session_counts",
    "sliding_counts",
    "tumbling_counts",
]
