from .edge_stream import streaming_edge_counts, streaming_degrees, streaming_window_stats

__all__ = ["streaming_edge_counts", "streaming_degrees", "streaming_window_stats"]
