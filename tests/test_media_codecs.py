"""Real container-header codec tests: the PNG/WAV writers and the
PNG/JPEG/GIF/WAV header parsers in multimodal.py round-trip without any
external codec library, and the mapInPandas feature stages surface the
REAL metadata (not the digest stub) for real containers."""

from __future__ import annotations

import struct
import zlib

from sc_crawler_spark.multimodal import (
    MEDIA_SCHEMA,
    encode_png,
    encode_wav,
    extract_audio_features,
    extract_image_features,
    parse_image_header,
    parse_wav_header,
)


def test_png_roundtrip():
    data = encode_png(123, 45, seed=7)
    assert parse_image_header(data) == (123, 45, "png")
    # the IDAT payload is real zlib: it must decompress to H*(1+3W) bytes
    idat_off = data.index(b"IDAT") + 4
    (idat_len,) = struct.unpack(">I", data[data.index(b"IDAT") - 4:data.index(b"IDAT")])
    raw = zlib.decompress(data[idat_off:idat_off + idat_len])
    assert len(raw) == 45 * (1 + 3 * 123)


def test_wav_roundtrip():
    data = encode_wav(22050, 441, channels=2, seed=3)
    rate, channels, duration_ms = parse_wav_header(data)
    assert (rate, channels) == (22050, 2)
    assert duration_ms == 441 * 1000 // 22050  # exactly 20 ms


def test_gif_and_jpeg_headers():
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert parse_image_header(gif) == (320, 200, "gif")

    # minimal JPEG marker stream: SOI, APP0 (skipped), SOF0 with H=480 W=640
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", 480, 640) + b"\x03" + b"\x00" * 9
    jpeg = b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    assert parse_image_header(jpeg) == (640, 480, "jpeg")

    assert parse_image_header(b"not an image") == (None, None, None)
    assert parse_wav_header(b"RIFFxxxxNOPE") == (None, None, None)


def test_image_features_use_real_headers(spark):
    rows = [
        (1, "image", bytearray(encode_png(64, 32, seed=1)), "image/png", None),
        (2, "image", bytearray(b"GIF87a" + struct.pack("<HH", 12, 34)),
         "image/gif", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in extract_image_features(media).collect()}
    assert (feats[1].width, feats[1].height, feats[1].format) == (64, 32, "png")
    assert (feats[2].width, feats[2].height, feats[2].format) == (12, 34, "gif")


def test_audio_features_use_real_headers(spark):
    rows = [
        (1, "audio", bytearray(encode_wav(44100, 2205)), "audio/wav", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    row = extract_audio_features(media).collect()[0]
    assert row.sample_rate == 44100
    assert row.n_channels == 1
    assert row.duration_ms == 50


def test_pixel_stats_decode_exact(spark):
    """The zlib inflate + unfilter must reproduce encode_png's pixels
    EXACTLY: channel sums equal the arithmetic the encoder ran. Also:
    non-PNG payloads and filter/color modes outside scope emit no row
    (never fake numbers)."""
    from sc_crawler_spark.multimodal import extract_pixel_stats

    w, h, seed = 5, 3, 9
    want_r = want_g = want_b = 0
    for y in range(h):
        for x in range(w):
            v = (x * 31 + y * 17 + seed) & 0xFF
            want_r += v
            want_g += (v * 3) & 0xFF
            want_b += (v * 7) & 0xFF
    rows = [
        (1, "image", bytearray(encode_png(w, h, seed=seed)),
         "image/png", None),
        (2, "image", bytearray(b"GIF87a" + struct.pack("<HH", 4, 4)),
         "image/gif", None),  # not a PNG: skipped
        (3, "audio", bytearray(encode_wav(8000, 10)), "audio/wav",
         None),  # wrong kind: filtered out before decode
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_pixel_stats(media).collect()}
    assert set(out) == {1}
    r = out[1]
    assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
    assert (r.sum_r, r.sum_g, r.sum_b) == (want_r, want_g, want_b)


def test_pixel_stats_rejects_corrupt_idat(spark):
    """A PNG whose IDAT does not inflate (or inflates to the wrong
    scanline length) must be skipped, not crash the batch or emit
    garbage."""
    from sc_crawler_spark.multimodal import extract_pixel_stats

    good = bytes(encode_png(4, 4, seed=1))
    # corrupt the IDAT body: flip bytes after the chunk tag
    i = good.index(b"IDAT")
    corrupt = bytearray(good)
    corrupt[i + 4:i + 10] = b"\x00\xff\x00\xff\x00\xff"
    rows = [(1, "image", bytearray(good), "image/png", None),
            (2, "image", corrupt, "image/png", None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id for r in extract_pixel_stats(media).collect()}
    assert out == {1}


def test_avi_header_roundtrip_and_frame_sampling(spark):
    """encode_avi's RIFF nesting must be readable back by the chunk
    walk (width/height/frames/us-per-frame exact), junk video payloads
    must emit nothing, and the sampled frames carry exact integer
    timestamps computed from the PARSED header."""
    from sc_crawler_spark.multimodal import (
        encode_avi, parse_avi_header, sample_avi_frames)

    payload = encode_avi(320, 240, 95, fps=24)
    assert parse_avi_header(payload) == (320, 240, 95, 41666)
    assert parse_avi_header(b"RIFFxxxxWAVE") is None
    assert parse_avi_header(b"junk") is None

    rows = [
        (1, "video", bytearray(payload), "video/x-msvideo", None),
        (2, "video", bytearray(b"\x00" * 4096), "video/mp4", None),
        (3, "audio", bytearray(encode_wav(8000, 10)), "audio/wav", None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = sample_avi_frames(media, every_n=30).collect()
    assert {r.media_id for r in got} == {1}
    frames = sorted((r.frame_idx, r.ts_ms) for r in got)
    # 95 frames sampled every 30: 0, 30, 60, 90; ts = idx * 41666 // 1000
    assert frames == [(0, 0), (30, 1249), (60, 2499), (90, 3749)]
    assert all((r.width, r.height) == (320, 240) for r in got)


def test_real_resize_roundtrip(spark):
    """decode -> nearest-neighbor -> re-encode must yield a VALID PNG
    whose pixels equal the numpy reference selection; images already
    inside the bound pass through byte-identical; non-PNG skips."""
    import numpy as np

    from sc_crawler_spark.multimodal import (
        _png_rgb_rows, resize_images_real)

    big = bytes(encode_png(40, 20, seed=3))
    small = bytes(encode_png(8, 8, seed=4))
    rows = [(1, "image", bytearray(big), "image/png", None),
            (2, "image", bytearray(small), "image/png", None),
            (3, "image", bytearray(b"GIF87a" + struct.pack("<HH", 4, 4)),
             "image/gif", None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           resize_images_real(media, max_side=16).collect()}
    assert set(out) == {1, 2}
    assert bytes(out[2].payload) == small          # pass-through
    r = out[1]
    assert (r.width, r.height) == (16, 8)          # 40x20 -> 16x8
    w, h, raw = _png_rgb_rows(bytes(r.payload))    # re-encode is valid
    assert (w, h) == (16, 8)
    got = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + w * 3)[:, 1:]
    _, _, raw0 = _png_rgb_rows(big)
    px0 = np.frombuffer(raw0, dtype=np.uint8).reshape(20, 1 + 40 * 3)[:, 1:]
    px0 = px0.reshape(20, 40, 3)
    want = px0[(np.arange(8) * 20) // 8][:, (np.arange(16) * 40) // 16]
    assert (got.reshape(8, 16, 3) == want).all()
