from .pipeline import (  # noqa: F401
    read_event_stream, stateful_best_scores, stream_keep_last_upsert,
    tumbling_stats,
)
