from .pipeline import (  # noqa: F401
    read_event_stream, stream_keep_last_upsert, tumbling_stats,
)
