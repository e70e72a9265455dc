"""Video columns: AVI/MJPEG container parse + frame sampling, pure Python.

Closes the video side of the multimodal codec seam
(llmops/multimodal.py) for the one video profile expressible without
libav: Motion-JPEG in an AVI (RIFF) container, where each frame is a
standalone baseline JPEG that llmops/jpeg.py already decodes. Inter-
frame codecs (H.264/VP9/AV1...) still need libav and keep raising
NotImplementedError at the same boundary.

Reference parity: beyond-reference scope (the reference is a
geospatial API) — this is the training-data-pipeline pattern of
carrying video as opaque ``binary`` + typed metadata and decoding only
the sampled frames, executor-side, via Arrow-batched ``mapInPandas``.
Sampling BEFORE decoding matters at 100 TB: a 1-in-30 frame sample
skips 97% of the Huffman/IDCT work, and the container index makes the
skip O(1) per frame (chunk scan, no decode of unsampled frames).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gfw_data_api_spark.llmops import multimodal as _mm


def _iter_riff_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_size) for a RIFF chunk run.
    ``end`` is clamped to the buffer so corrupt chunk sizes can't walk
    reads past the payload (ValueError territory, never struct.error)."""
    end = min(end, len(data))
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield cid, pos + 8, min(size, max(end - pos - 8, 0))
        pos += 8 + size + (size & 1)  # word-aligned


def parse_avi(data: bytes) -> dict:
    """Parse an AVI container → header metadata + frame chunk offsets.

    Returns ``{"width", "height", "fps", "n_frames", "codec",
    "frames": [(offset, size), ...]}`` without decoding any frame —
    the container scan is O(file size) byte bookkeeping only.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI signature")
    width = height = 0
    fps = 0.0
    codec = ""
    frames: list[tuple[int, int]] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, fps, codec
        for cid, body, size in _iter_riff_chunks(data, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip list-type fourcc
            elif cid == b"avih" and size >= 40:
                (usec_per_frame,) = struct.unpack_from("<I", data, body)
                w, h = struct.unpack_from("<2I", data, body + 32)
                if usec_per_frame:
                    fps = 1_000_000.0 / usec_per_frame
                width, height = int(w), int(h)
            elif cid == b"strh" and size >= 8:
                if data[body : body + 4] == b"vids":
                    codec = data[body + 4 : body + 8].decode("latin1").strip().lower()
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append((body, size))

    walk(12, len(data))
    return {
        "width": width,
        "height": height,
        "fps": fps,
        "n_frames": len(frames),
        "codec": codec,
        "frames": frames,
    }


def decode_avi_frames(data: bytes, indices: list[int] | None = None) -> list[np.ndarray]:
    """Decode selected frames of an MJPEG AVI → list of (H, W, C) uint8.

    ``indices=None`` decodes every frame. Only the selected chunks hit
    the JPEG decoder; the rest are skipped at container level.
    """
    from gfw_data_api_spark.llmops.jpeg import decode_jpeg

    info = parse_avi(data)
    if info["codec"] not in ("mjpg", "mjpeg", ""):
        raise NotImplementedError(
            f"AVI codec {info['codec']!r} outside subset (MJPG); inter-frame codecs "
            "need libav, unavailable here"
        )
    chunks = info["frames"]
    if indices is None:
        indices = list(range(len(chunks)))
    out = []
    for i in indices:
        if not 0 <= i < len(chunks):
            raise IndexError(f"frame index {i} out of range (n_frames={len(chunks)})")
        off, size = chunks[i]
        body = data[off : off + size]
        if body[:3] != b"\xff\xd8\xff":
            raise NotImplementedError("AVI frame chunk is not a JPEG (non-MJPEG stream)")
        out.append(decode_jpeg(body))
    return out


def encode_avi_mjpeg(frames: list[bytes], fps: float, width: int, height: int) -> bytes:
    """Minimal MJPEG-AVI writer — fixture/export twin of ``parse_avi``.

    ``frames`` are pre-encoded JPEG byte strings (llmops/jpeg.encode_jpeg).
    """
    if fps <= 0:
        raise ValueError("fps must be positive")

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = int(round(1_000_000 / fps))
    avih = struct.pack(
        "<14I",
        usec, 0, 0, 0x10, len(frames), 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<I", 0)
        + struct.pack("<HHI", 0, 0, 0)          # priority, language, initial frames
        + struct.pack("<3I", 1, int(round(fps)), 0)  # scale, rate, start
        + struct.pack("<3I", len(frames), 0, 0)      # length, buf size, quality
        + struct.pack("<I", 0) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + len(movi)) + b"AVI " + hdrl + movi


def video_content_keys(
    df: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """Append a container-invariant ``video_key`` per video payload.

    The key is md5 over the DECODED frame pixels in order (shape-tagged),
    so remuxing — a different container, fps, header metadata, chunk
    layout — cannot change it while any pixel change does. This is the
    dedup key a crawl pipeline wants for videos re-uploaded with
    different encoders' container defaults; byte-level sha keys
    (media_dedup_keys) miss every remux. Works for MJPEG-AVI and
    animated GIF payloads; undecodable rows get NULL.
    """
    import hashlib

    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("video_key", T.StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = []
            for payload in pdf[payload_col]:
                if payload is None:
                    keys.append(None)
                    continue
                data = bytes(payload)
                try:
                    if data[:6] in (b"GIF87a", b"GIF89a"):
                        from gfw_data_api_spark.llmops.gif import decode_gif

                        frames, _ = decode_gif(data)
                    else:
                        frames = decode_avi_frames(data)
                    if not frames:
                        # empty containers must not share an
                        # md5-of-nothing key
                        keys.append(None)
                        continue
                    h = hashlib.md5()
                    for fr in frames:
                        h.update(str(fr.shape).encode())
                        h.update(np.ascontiguousarray(fr).tobytes())
                    keys.append(h.hexdigest())
                except _mm.DECODE_ERRORS:
                    keys.append(None)
            pdf = pdf.copy()
            pdf["video_key"] = keys
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


_FRAME_SCHEMA_FIELDS = [
    T.StructField("frame_index", T.IntegerType()),
    T.StructField("frame_width", T.IntegerType()),
    T.StructField("frame_height", T.IntegerType()),
    T.StructField("frame_mean_luma", T.DoubleType()),
    T.StructField("frame_png", T.BinaryType()),
]


def decode_sampled_frames(
    df: DataFrame,
    every_nth: int,
    payload_col: str = "payload",
    emit_png: bool = False,
) -> DataFrame:
    """Explode video rows into one row per sampled decoded frame.

    Plan shape: mapInPandas (decode + explode in one Arrow stage) — the
    per-row fan-out stays inside the partition, so no shuffle is
    introduced; downstream ops see ordinary columns. ``emit_png``
    re-encodes each sampled frame losslessly for hand-off to an image
    model (NULL otherwise, keeping batches small). Non-AVI or
    non-MJPEG rows yield no frames (same skip convention as the other
    decoders' NULL features).
    """
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    out_schema = T.StructType(list(df.schema.fields) + _FRAME_SCHEMA_FIELDS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from gfw_data_api_spark.llmops.multimodal import encode_png

        for pdf in batches:
            out_rows = []
            records = pdf.to_dict("records")  # column-wise, no iterrows
            for row in records:
                payload = row[payload_col]
                if payload is None:
                    continue
                data = bytes(payload)
                try:
                    if data[:6] in (b"GIF87a", b"GIF89a"):
                        from gfw_data_api_spark.llmops.gif import decode_gif

                        all_frames, _delays = decode_gif(data)
                        idx = list(range(0, len(all_frames), every_nth))
                        decoded = [all_frames[i] for i in idx]
                    else:
                        info = parse_avi(data)
                        idx = list(range(0, info["n_frames"], every_nth))
                        decoded = decode_avi_frames(data, idx)
                except _mm.DECODE_ERRORS:
                    continue
                for i, frame in zip(idx, decoded):
                    rec = dict(row)
                    rec["frame_index"] = i
                    rec["frame_height"], rec["frame_width"] = frame.shape[:2]
                    luma = frame if frame.ndim == 2 else frame.mean(axis=2)
                    rec["frame_mean_luma"] = float(luma.mean())
                    rec["frame_png"] = bytearray(encode_png(frame)) if emit_png else None
                    out_rows.append(rec)
            yield pd.DataFrame(out_rows, columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(run, schema=out_schema)
