"""Overlapping fixed-window document chunking — the context-window prep
step of a training pipeline, shared by the batch query
(queries/pipeline.chunk_documents) and the streaming ingest twin
(streaming.stream_chunk_documents).

Stateless per-row transform: each document emits its chunk index range
with ``sequence`` + ``explode`` and the chunk content leaves as an MD5
(the downstream chunk-dedup key) plus its length, so the exploded
relation stays narrow at 100 TB. Zero shuffles; on a stream it needs no
watermark or state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHUNK_SIZE = 200
CHUNK_STRIDE = 150


def chunk_docs(docs: DataFrame, size: int = CHUNK_SIZE,
               stride: int = CHUNK_STRIDE) -> DataFrame:
    """(doc_id, chunk_idx, chunk_start, chunk_hash, chunk_len) per
    overlapping window; start positions ``i*stride`` while
    ``i*stride < length(text)`` (an empty text still emits its one
    empty chunk). Plan: Scan -> Generate -> Project, exchange-free."""
    last_idx = F.greatest(
        F.floor((F.length("text") - 1) / stride).cast("int"), F.lit(0))
    start = (F.col("chunk_idx") * stride + 1).cast("long")
    chunk = F.col("text").substr(start.cast("int"), F.lit(size))
    return (
        docs.select(
            "doc_id", "text",
            F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"))
        .select(
            "doc_id", "chunk_idx", start.alias("chunk_start"),
            F.md5(chunk).alias("chunk_hash"),
            F.length(chunk).alias("chunk_len"))
    )
