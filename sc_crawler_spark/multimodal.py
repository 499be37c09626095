"""Multimodal column plumbing for the training-data pipeline.

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The codec libraries (Pillow,
ffmpeg, torchaudio) are NOT in this container, so the decode kernels are
STUBBED behind ``_decode_image_stub`` (deterministic fake) and raise
``NotImplementedError`` when a real decode is requested — the Spark-side
plumbing (schema, batching, partition sizing, UDF signatures) is real and
tested.

Scale notes: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
rows-with-blobs fits executor memory, and always select metadata columns
without the blob when the kernel doesn't need bytes (column pruning skips
the IO entirely in parquet).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),      # image|audio|video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("source_uri", StringType()),
])

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType()),
    StructField("sha1", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("format", StringType()),
])


def _decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """Deterministic fake decoder: derives (width, height, format) from
    the payload digest. Replace with a real codec (PIL/cv2) in an
    environment that ships one — the call site and batch shape stay
    identical."""
    import hashlib

    h = hashlib.sha1(payload).digest()  # noqa: S324 - fingerprint, not auth
    return 16 + h[0] % 240, 16 + h[1] % 240, ["png", "jpeg", "webp"][h[2] % 3]


def extract_image_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode/feature-extract stage over the binary column via
    ``mapInPandas`` (Arrow batches; one python worker per partition)."""
    if real_decode:
        raise NotImplementedError(
            "real image decode needs a codec library (PIL/cv2) not present "
            "in this environment; plumbing is exercised via the stub"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, fmt = _decode_image_stub(data)
                rows.append((
                    media_id, len(data),
                    hashlib.sha1(data).hexdigest(),  # noqa: S324
                    w, h, fmt,
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(_batches, IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("payload", BinaryType()),
])


def resize_images(media: DataFrame, max_side: int = 256,
                  real_decode: bool = False) -> DataFrame:
    """Resize stage: aspect-preserving downscale to ``max_side``.

    The pixel kernel is stubbed (no codec here): output dims follow the
    stub decoder's dims scaled to max_side, payload passes through
    truncated-by-ratio so byte volume shrinks like a real resize would.
    The Spark shape is real — mapInPandas over binary Arrow batches, blob
    column pruned when downstream selects metadata only.
    """
    if real_decode:
        raise NotImplementedError(
            "real resize needs a codec library (PIL/cv2) not present here"
        )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, _ = _decode_image_stub(data)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                keep = max(1, int(len(data) * scale * scale)) if data else 0
                rows.append((media_id, nw, nh, data[:keep]))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    imgs = media.filter(F.col("kind") == "image").select("media_id", "payload")
    return imgs.mapInPandas(_batches, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("n_bytes", LongType()),
    StructField("duration_s", IntegerType()),
    StructField("sample_rate", IntegerType()),
])


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Audio feature stage (duration/sample-rate): stub model derives
    both from payload size deterministically (16 kHz mono 16-bit —
    duration = bytes / 32000). Real decoders slot into the same
    mapInPandas signature."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                n = len(bytes(payload)) if payload is not None else 0
                rows.append((media_id, n, max(0, n // 32000), 16000))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    auds = media.filter(F.col("kind") == "audio").select("media_id", "payload")
    return auds.mapInPandas(_batches, AUDIO_FEATURES_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_idx) plan rows that
    a real extractor would fill with frames. Frame decode itself is
    stubbed (no ffmpeg here); the fan-out shape — one row per sampled
    frame via explode over a computed index range — is the real pattern.
    """
    vids = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.length(F.col("payload")).alias("n_bytes"),
    )
    # stub duration model: 1 "frame" per 1 KiB of payload
    n_frames = (F.col("n_bytes") / 1024).cast("int") + 1
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
