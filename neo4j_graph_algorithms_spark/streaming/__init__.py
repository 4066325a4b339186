from .edge_stream import (
    streaming_dedup_first_seen,
    streaming_degrees,
    streaming_edge_counts,
    streaming_near_dedup_minhash,
    streaming_window_stats,
)

__all__ = [
    "streaming_dedup_first_seen",
    "streaming_degrees",
    "streaming_edge_counts",
    "streaming_near_dedup_minhash",
    "streaming_window_stats",
]
