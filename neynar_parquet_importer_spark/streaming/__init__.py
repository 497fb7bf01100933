from .pipeline import ImportPipeline, streaming_window_counts

__all__ = ["ImportPipeline", "streaming_window_counts"]
