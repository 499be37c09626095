from .pipeline import (  # noqa: F401
    incremental_daily_rollup, read_document_stream, read_event_stream,
    stateful_best_scores, stateful_best_scores_tws, stream_attribution_join,
    stream_chunk_documents, stream_exact_dedup, stream_ingest_gate,
    stream_keep_last_upsert,
    stream_dsir_gate, stream_lr_quality_gate, stream_near_dedup,
    stream_server_inventory, streaming_cms_sketch, streaming_sessions,
    tumbling_stats,
)
