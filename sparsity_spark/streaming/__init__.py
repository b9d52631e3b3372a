from sparsity_spark.streaming.ingest import (
    stream_events,
    streaming_attribution_join,
    streaming_dedup_exact,
    streaming_dedup_neardup,
    streaming_enriched_counts,
    streaming_ewma,
    streaming_one_hot_counts,
    streaming_screen_and_maintain,
    streaming_semantic_screen,
    streaming_screen_vs_store,
    streaming_session_stats,
    streaming_sliding_counts,
)

__all__ = [
    "stream_events",
    "streaming_attribution_join",
    "streaming_dedup_exact",
    "streaming_dedup_neardup",
    "streaming_enriched_counts",
    "streaming_ewma",
    "streaming_one_hot_counts",
    "streaming_screen_and_maintain",
    "streaming_semantic_screen",
    "streaming_screen_vs_store",
    "streaming_session_stats",
    "streaming_sliding_counts",
]
