"""Multimodal columns: media as opaque binary + typed metadata.

Model: a media column is ``binary`` payload beside a
``struct<media_type, format, width, height, duration_ms, n_frames>``
metadata column. Decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages so a 100 TB media table
processes with ordinary partition parallelism and bounded memory
(``maxRecordsPerBatch`` caps batch bytes).

Codec support: baseline JFIF JPEG (gray/YCbCr, 4:4:4/4:2:2/4:2:0,
restart intervals — llmops/jpeg.py), PNG (all five scanline filters,
gray / RGB / palette / alpha at 8-bit depth), uncompressed 24-bit BMP,
PCM/float WAV audio (llmops/audio.py), and MJPEG-AVI video
(llmops/video.py) all decode in pure Python (zlib is stdlib), so
image, audio, and video rows decode for real. Compressed audio
(MP3/AAC/Opus) and inter-frame video (H.264/VP9/AV1) need libav,
absent here, and raise NotImplementedError at the codec boundary;
``fake=True`` substitutes a deterministic hash-derived pseudo-decode
to exercise the pipeline shape regardless of format. Swapping in
PIL/ffmpeg remains a one-function change.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# Every exception a malformed payload can surface from the pure-Python
# codecs (truncated headers → IndexError, missing Huffman tables →
# KeyError, corrupt IDAT → zlib.error, bad struct reads, explicit
# ValueError/NotImplementedError rejections). Batch skip-handlers catch
# THIS tuple so one bad row NULLs instead of killing a 100 TB job.
DECODE_ERRORS = (
    ValueError,
    NotImplementedError,
    struct.error,
    IndexError,
    KeyError,
    zlib.error,
)
# PNG color type → channel count (bit depth 8 supported)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> np.ndarray:
    """Pure-Python PNG decode → uint8 array (H, W, C).

    Supports the baseline still-image profile: 8-bit depth, color types
    0/2/3/4/6, non-interlaced, all five scanline filters (None, Sub, Up,
    Average, Paeth). Runs inside mapInPandas batches; per-row filter
    reconstruction is sequential by spec (each pixel depends on the
    previous), so rows loop in Python — heavy production decodes swap in
    a native codec at this same seam.
    """
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">2I5B", body
            )
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG profile outside subset (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); supported: 8-bit non-interlaced types 0/2/3/4/6"
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(height):
        row_off = y * (stride + 1)
        filt = raw[row_off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=row_off + 1).astype(
            np.int32
        )
        if filt == 0:  # None
            recon = line
        elif filt == 1:  # Sub — cumulative per channel phase
            recon = line.copy()
            for c in range(channels):
                recon[c::channels] = np.cumsum(recon[c::channels]) & 0xFF
        elif filt == 2:  # Up — fully vectorized
            recon = (line + prev) & 0xFF
        elif filt == 3:  # Average
            recon = line.copy()
            for x in range(stride):
                left = recon[x - channels] if x >= channels else 0
                recon[x] = (recon[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            recon = line.copy()
            for x in range(stride):
                left = recon[x - channels] if x >= channels else 0
                up = prev[x]
                ul = prev[x - channels] if x >= channels else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                recon[x] = (recon[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {filt} invalid")
        out[y] = recon.astype(np.uint8)
        prev = recon
    img = out.reshape(height, width, channels)
    if color_type == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        img = palette[img[:, :, 0]]
    return img


def encode_png(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT) — fixture/export twin of
    ``decode_png``. Accepts uint8 (H, W) gray or (H, W, {1,2,3,4})."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">2I5B", width, height, 8, color_type, 0, 0, 0)
    scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(height))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP decode → uint8 array (H, W, 3) RGB.
    Rows are stored bottom-up, BGR, padded to 4-byte boundaries."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP: bad signature")
    (data_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<2i", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"BMP profile outside subset (bpp={bpp}, compression={compression}); "
            "supported: uncompressed 24-bit"
        )
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3
    img = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        off = data_off + y * row_bytes
        row = np.frombuffer(data, dtype=np.uint8, count=width * 3, offset=off).reshape(
            width, 3
        )
        img[height - 1 - y if bottom_up else y] = row[:, ::-1]  # BGR → RGB
    return img

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload to an array.

    Real decode for PNG, uncompressed 24-bit BMP, and baseline JFIF
    JPEG (sniffed by magic bytes — pure-Python codecs here and in
    llmops/jpeg.py). Audio/video need libav, absent in this
    environment, and raise NotImplementedError at this boundary.
    ``fake=True`` substitutes a deterministic pseudo-decode (bytes →
    seeded array) for any format, exercising the full pipeline shape.
    """
    if fake:
        digest = hashlib.sha256(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.random(64, dtype=np.float64)
    data = bytes(payload)
    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:3] == b"\xff\xd8\xff":
        from gfw_data_api_spark.llmops.jpeg import decode_jpeg

        return decode_jpeg(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        from gfw_data_api_spark.llmops.audio import decode_wav

        samples, _rate = decode_wav(data)
        return samples
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        from gfw_data_api_spark.llmops.video import decode_avi_frames

        frames = decode_avi_frames(data)
        if not frames:
            # mirror the GIF path: an empty container must not flow on
            # (a (0,) array would mean-pool into NaN feature vectors)
            raise ValueError("AVI contains no frames")
        return np.stack(frames)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        from gfw_data_api_spark.llmops.gif import decode_gif

        frames, _delays = decode_gif(data)
        return frames[0] if len(frames) == 1 else np.stack(frames)
    raise NotImplementedError(
        "no codec for this payload format (PNG, 24-bit BMP, baseline JPEG, "
        "GIF, PCM/float WAV, and MJPEG-AVI decode natively; compressed audio "
        "and inter-frame video need ffmpeg, unavailable here); pass "
        "fake=True for the deterministic test decode"
    )


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    fake: bool = True,
) -> DataFrame:
    """Feature extraction over media payloads via mapInPandas.

    Output schema = input + ``features array<float>`` + ``content_sha256``.
    Batches stream through Arrow; nothing is collected driver-side.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("content_sha256", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes = [], []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                if payload is None:
                    feats.append(None)
                    hashes.append(None)
                    continue
                data = bytes(payload)
                media_type = meta["media_type"] if meta is not None else "image"
                decoded = decode_media(data, media_type, fake=fake)
                # pooled pseudo-embedding: fixed-dim mean-pool of the
                # flattened decode (zero-padded to a FEATURE_DIM multiple
                # so real images of any size pool to the same width)
                flat = np.asarray(decoded, dtype=np.float64).ravel()
                pad = (-len(flat)) % FEATURE_DIM
                if pad:
                    flat = np.pad(flat, (0, pad))
                pooled = flat.reshape(FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
                feats.append(pooled.tolist())
                hashes.append(hashlib.sha256(data).hexdigest())
            pdf = pdf.copy()
            pdf["features"] = feats
            pdf["content_sha256"] = hashes
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def bilinear_resize(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized bilinear resize of a (H, W[, C]) uint8 array.

    Pixel-center (align_corners=False) sampling with edge clamping —
    the convention PIL/OpenCV use — fully in numpy fancy indexing, no
    per-pixel Python loop.
    """
    arr = np.asarray(img, dtype=np.float64)
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    h_in, w_in, _ = arr.shape
    ys = (np.arange(height) + 0.5) * (h_in / height) - 0.5
    xs = (np.arange(width) + 0.5) * (w_in / width) - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h_in - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w_in - 1)
    y1 = np.minimum(y0 + 1, h_in - 1)
    x1 = np.minimum(x0 + 1, w_in - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    top = arr[y0[:, None], x0[None, :]] * (1 - wx) + arr[y0[:, None], x1[None, :]] * wx
    bot = arr[y1[:, None], x0[None, :]] * (1 - wx) + arr[y1[:, None], x1[None, :]] * wx
    # half-up rounding (not banker's): keeps resize equivariant under
    # integer brightness shifts, which perceptual hashing relies on
    out = np.clip(np.floor(top * (1 - wy) + bot * wy + 0.5), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    decode: bool = False,
) -> DataFrame:
    """Resize stage.

    ``decode=False`` (planning mode): passes payloads through and
    rewrites metadata dims natively — no UDF, no decode; use when a
    downstream consumer does the pixel work. ``decode=True``: decodes
    each image payload (PNG/BMP/JPEG), bilinear-resizes in numpy, and
    re-encodes as lossless PNG inside an Arrow-batched mapInPandas
    stage; undecodable image rows pass through unchanged (format kept
    in metadata). Metadata bookkeeping stays native in both modes.
    """
    meta = F.col(meta_col)
    if not decode:
        planned_meta = F.struct(
            meta["media_type"].alias("media_type"),
            meta["format"].alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            meta["duration_ms"].alias("duration_ms"),
            meta["n_frames"].alias("n_frames"),
        )
        return df.withColumn(meta_col, planned_meta)
    # decode mode: dims/format are rewritten ONLY for rows that actually
    # resized — passthrough rows (undecodable, animated) keep metadata
    # that still describes their bytes
    new_meta = F.struct(
        meta["media_type"].alias("media_type"),
        F.when(F.col("__resized"), F.lit("png"))
        .otherwise(meta["format"])
        .alias("format"),
        F.when(F.col("__resized"), F.lit(width))
        .otherwise(meta["width"])
        .alias("width"),
        F.when(F.col("__resized"), F.lit(height))
        .otherwise(meta["height"])
        .alias("height"),
        meta["duration_ms"].alias("duration_ms"),
        meta["n_frames"].alias("n_frames"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, flags = [], []
            for payload in pdf[payload_col]:
                if payload is None:
                    payloads.append(None)
                    flags.append(False)
                    continue
                try:
                    img = decode_media(bytes(payload), "image")
                except DECODE_ERRORS:
                    payloads.append(payload)
                    flags.append(False)
                    continue
                if img.ndim not in (2, 3):
                    # multi-frame decode (animated GIF, AVI stack) — a
                    # still-image resize has no defined semantics here;
                    # pass through like undecodable rows
                    payloads.append(payload)
                    flags.append(False)
                    continue
                resized = bilinear_resize(img, width, height)
                payloads.append(bytearray(encode_png(resized)))
                flags.append(True)
            pdf = pdf.copy()
            pdf[payload_col] = payloads
            pdf["__resized"] = flags
            yield pdf

    work_schema = T.StructType(list(df.schema.fields) + [T.StructField("__resized", T.BooleanType())])
    return (
        df.mapInPandas(run, schema=work_schema)
        .withColumn(meta_col, new_meta)
        .drop("__resized")
    )


def sample_frames(
    df: DataFrame,
    every_nth: int,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Frame-sampling plan for video rows: computes the sampled frame index
    list natively; the decode of those frames is the stubbed step."""
    n_frames = F.coalesce(F.col(meta_col)["n_frames"], F.lit(0))
    return df.withColumn(
        "sampled_frames",
        F.when(
            F.col(meta_col)["media_type"] == "video",
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_nth)),
        ).otherwise(F.array().cast("array<int>")),
    )


def media_dedup_keys(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact media dedup key: sha256 of payload bytes (native, no UDF)."""
    return df.withColumn("media_key", F.sha2(F.col(payload_col), 256))
