from .stream_view import (  # noqa: F401
    StreamingMapReduceView,
    streaming_dedup,
    streaming_sessionize,
    streaming_tumbling_counts,
)
