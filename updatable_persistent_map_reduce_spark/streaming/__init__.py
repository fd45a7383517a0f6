from .stream_view import StreamingMapReduceView, streaming_tumbling_counts  # noqa: F401
