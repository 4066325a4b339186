from .edge_stream import (
    streaming_dedup_first_seen,
    streaming_degrees,
    streaming_edge_counts,
    streaming_window_stats,
)

__all__ = [
    "streaming_dedup_first_seen",
    "streaming_degrees",
    "streaming_edge_counts",
    "streaming_window_stats",
]
