from .edge_stream import (
    streaming_dedup_first_seen,
    streaming_degrees,
    streaming_edge_counts,
    streaming_near_dedup_minhash,
    streaming_window_stats,
    streaming_sessions,
)
from .incremental_wcc import (
    IncrementalWccSink,
    incremental_wcc_batch,
    streaming_incremental_wcc,
)

__all__ = [
    "IncrementalWccSink",
    "incremental_wcc_batch",
    "streaming_dedup_first_seen",
    "streaming_degrees",
    "streaming_edge_counts",
    "streaming_incremental_wcc",
    "streaming_near_dedup_minhash",
    "streaming_window_stats",
    "streaming_sessions",
]
