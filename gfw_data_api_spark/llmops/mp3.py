"""MP3 (MPEG-1 Audio Layer III) frame-layer parsing, pure Python.

Round-6 closure of the audio-container side of the codec seam
(llmops/audio.py): a 100 TB multimodal corpus needs to TRIAGE audio —
duration, bitrate shape (CBR/VBR), channel mode, sample rate, byte
accounting — long before it needs PCM. That triage lives entirely in
the frame layer of the public MPEG-1 audio header format (the 32-bit
sync header, the Layer III frame-length arithmetic, ID3v1/v2 tag
skipping, Xing/Info and VBRI VBR headers), which this module
implements natively and exposes as an Arrow-batched ``mapInPandas``
stage.

Full PCM decode stays a documented NotImplementedError seam
(:func:`decode_mp3`): requantization and synthesis are publicly
specified, but ISO/IEC 11172-3 Layer III entropy coding depends on 34
Huffman code tables whose exact contents are DATA from the spec annex
— not derivable, and not available in this offline environment.
Reconstructing them from memory risks silently-garbled audio, the
same loud-reject-over-silent-garbage policy as the FileGDB CDF
decision (docs/PARITY.md).

Reference parity: the reference has no audio path (it is a geospatial
API); this is the beyond-reference training-data family. Only MPEG-1
Layer III is in-subset; MPEG-2/2.5, Layers I/II, and free-format
bitrate reject loudly with the profile named.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# MPEG-1 Layer III bitrate table, kbps, index 1..14 (0 = free-format,
# 15 = invalid — both rejected); sample-rate table index 0..2
_BITRATE_KBPS = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_SAMPLE_RATES = (44100, 48000, 32000)
_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III

_CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    """MPEG-1 Layer III frame byte length: ``144 * bitrate / rate``
    truncated, plus one padding byte — the constant 144 is
    samples-per-frame (1152) / 8 bits."""
    return 144_000 * bitrate_kbps // sample_rate + padding


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 when absent). Size is
    sync-safe (7 bits per byte); the footer flag adds 10 more. Shared
    with the AAC/ADTS walker — the message stays container-neutral."""
    if len(data) < 10 or data[:3] != b"ID3":
        return 0
    flags = data[5]
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            raise ValueError("corrupt ID3v2 tag: size bytes must be sync-safe")
        size = (size << 7) | b
    return 10 + size + (10 if flags & 0x10 else 0)


def parse_frame_header(data: bytes, pos: int) -> dict:
    """Parse one 32-bit MPEG audio frame header at ``pos``. Raises on
    anything outside the MPEG-1 Layer III subset — silently skipping
    bytes is how corrupt corpora hide."""
    if pos + 4 > len(data):
        raise ValueError("truncated MP3: header runs past end of payload")
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(f"lost MP3 frame sync at byte {pos}")
    version = (b1 >> 3) & 0x3
    layer = (b1 >> 1) & 0x3
    if version != 0b11:
        raise NotImplementedError(
            "MPEG-2/2.5 audio outside subset (MPEG-1 Layer III only)"
        )
    if layer != 0b01:
        raise NotImplementedError(
            f"MPEG-1 Layer {'-I' if layer == 0b11 else '-II' if layer == 0b10 else '?'}"
            " outside subset (Layer III only)"
        )
    crc = (b1 & 0x1) == 0  # protection bit 0 → 16-bit CRC follows header
    bitrate_idx = (b2 >> 4) & 0xF
    if bitrate_idx == 0:
        raise NotImplementedError("free-format bitrate outside subset")
    if bitrate_idx == 0xF:
        raise ValueError(f"invalid MP3 bitrate index 15 at byte {pos}")
    rate_idx = (b2 >> 2) & 0x3
    if rate_idx == 0x3:
        raise ValueError(f"reserved MP3 sample-rate index at byte {pos}")
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3
    kbps = _BITRATE_KBPS[bitrate_idx]
    rate = _SAMPLE_RATES[rate_idx]
    return {
        "crc": crc,
        "bitrate_kbps": kbps,
        "sample_rate": rate,
        "padding": padding,
        "channel_mode": _CHANNEL_MODES[mode],
        "length": frame_length(kbps, rate, padding),
        # MPEG-1 side info: 17 bytes mono, 32 otherwise (after the
        # optional CRC) — where the Xing/Info VBR tag sits
        "side_info": 17 if mode == 0b11 else 32,
    }


def _xing_frame_count(data: bytes, pos: int, hdr: dict) -> int | None:
    """Frame count from a Xing/Info tag in the frame at ``pos`` (None
    when absent). Offset: header + optional CRC + side info."""
    off = pos + 4 + (2 if hdr["crc"] else 0) + hdr["side_info"]
    if off + 8 > len(data) or data[off : off + 4] not in (b"Xing", b"Info"):
        # VBRI (Fraunhofer) sits at a fixed 32-byte offset past the header
        voff = pos + 4 + 32
        if voff + 18 <= len(data) and data[voff : voff + 4] == b"VBRI":
            return struct.unpack_from(">I", data, voff + 14)[0]
        return None
    (flags,) = struct.unpack_from(">I", data, off + 4)
    if not flags & 0x1:  # frames field absent
        return None
    if off + 12 > len(data):
        raise ValueError("truncated Xing header")
    return struct.unpack_from(">I", data, off + 8)[0]


def parse_mp3(data: bytes) -> dict:
    """Walk every frame of an MPEG-1 Layer III stream → summary dict.

    Skips a leading ID3v2 tag and a trailing 128-byte ID3v1 ``TAG``
    block; anything else that breaks the frame walk raises (strict —
    truncated/corrupt containers must not pass as shorter audio).

    Returns: n_frames, total_samples, duration_us (exact integer
    arithmetic at the stream sample rate), sample_rate, channel_mode,
    is_vbr (any bitrate change across frames), sum_kbps (sum of
    per-frame bitrates — exact, so averages stay rational),
    audio_bytes, xing_frames (declared VBR-header count or None).
    """
    start = _id3v2_size(data)
    end = len(data)
    if end - start >= 128 and data[end - 128 : end - 125] == b"TAG":
        end -= 128
    if start >= end:
        raise ValueError("not MP3: no audio bytes outside tags")
    pos = start
    n = 0
    sum_kbps = 0
    rate = None
    mode = None
    vbr = False
    first_kbps = None
    xing = None
    while pos < end:
        hdr = parse_frame_header(data, pos)
        if pos + hdr["length"] > end:
            raise ValueError(
                f"truncated MP3: frame {n} declares {hdr['length']} bytes "
                f"but only {end - pos} remain"
            )
        if n == 0:
            rate = hdr["sample_rate"]
            mode = hdr["channel_mode"]
            first_kbps = hdr["bitrate_kbps"]
            xing = _xing_frame_count(data, pos, hdr)
        else:
            if hdr["sample_rate"] != rate:
                raise ValueError("sample-rate change mid-stream (corrupt MP3)")
            if hdr["channel_mode"] != mode:
                raise ValueError("channel-mode change mid-stream (corrupt MP3)")
            if hdr["bitrate_kbps"] != first_kbps:
                vbr = True
        sum_kbps += hdr["bitrate_kbps"]
        pos += hdr["length"]
        n += 1
    return {
        "n_frames": n,
        "total_samples": n * _SAMPLES_PER_FRAME,
        "duration_us": n * _SAMPLES_PER_FRAME * 1_000_000 // rate,
        "sample_rate": rate,
        "channel_mode": mode,
        "is_vbr": vbr,
        "sum_kbps": sum_kbps,
        "audio_bytes": pos - start,
        "xing_frames": xing,
    }


def decode_mp3(data: bytes):  # pragma: no cover - documented seam
    """PCM decode is OUT of the offline-implementable subset: Layer III
    entropy coding needs the 34 Huffman code tables from ISO/IEC
    11172-3's annex — spec DATA, unavailable offline, and wrong-table
    output would be silently-garbled audio. Same policy as the
    FileGDB CDF no-go (docs/PARITY.md): loud reject over silent
    garbage. The frame layer (:func:`parse_mp3`) is fully supported."""
    raise NotImplementedError(
        "MP3 PCM decode needs the ISO 11172-3 Huffman tables (spec data "
        "not available offline); parse_mp3 provides the frame-layer "
        "metadata, or transcode to WAV upstream for decode_wav"
    )


def build_mp3(
    frame_kbps: list[int],
    sample_rate: int = 44100,
    mono: bool = False,
    pad_mask: list[int] | None = None,
    with_crc: bool = False,
    xing_count: int | None = None,
    id3v2_bytes: int = 0,
    id3v1: bool = False,
    fill_seed: int = 0,
) -> bytes:
    """Fixture builder: a syntactically-exact MPEG-1 Layer III stream
    with the requested per-frame bitrates/padding, deterministic filler
    main data (NOT meaningful audio — decode is out of subset), an
    optional Xing count in frame 0, and optional ID3 tags. The byte
    layout mirrors what :func:`parse_mp3` must invert; the m10 gate's
    oracle recomputes every length from the planted parameters
    arithmetically, so the frame-length formula is cross-checked by an
    independent engine rather than round-trip alone."""
    out = bytearray()
    if id3v2_bytes:
        body = bytes((fill_seed + i) % 251 for i in range(id3v2_bytes))
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3v2_bytes >> 21) & 0x7F, (id3v2_bytes >> 14) & 0x7F,
             (id3v2_bytes >> 7) & 0x7F, id3v2_bytes & 0x7F]
        ) + body
    rate_idx = _SAMPLE_RATES.index(sample_rate)
    for j, kbps in enumerate(frame_kbps):
        pad = pad_mask[j] if pad_mask else 0
        bidx = _BITRATE_KBPS.index(kbps)
        b0 = 0xFF
        b1 = 0xE0 | (0b11 << 3) | (0b01 << 1) | (0 if with_crc else 1)
        b2 = (bidx << 4) | (rate_idx << 2) | (pad << 1)
        b3 = (0b11 << 6) if mono else 0x00  # stereo mode bits 00
        frame = bytearray([b0, b1, b2, b3])
        if with_crc:
            frame += bytes([(fill_seed + j) % 251, (fill_seed + j + 1) % 251])
        total = frame_length(kbps, sample_rate, pad)
        side = 17 if mono else 32
        si_off = len(frame)
        frame += bytes(side)  # zeroed side info (no bit reservoir)
        if j == 0 and xing_count is not None:
            frame += b"Xing" + struct.pack(">II", 0x1, xing_count)
        while len(frame) < total:
            frame.append((fill_seed + j * 7 + len(frame)) % 251)
        if len(frame) > total:
            raise ValueError(
                f"frame {j} overflow: side info + headers exceed {total} bytes"
            )
        assert si_off <= total
        out += frame
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


MP3_INFO_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_samples", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channel_mode", T.StringType()),
        T.StructField("is_vbr", T.BooleanType()),
        T.StructField("sum_kbps", T.LongType()),
        T.StructField("audio_bytes", T.LongType()),
        T.StructField("xing_frames", T.LongType()),
    ]
)


def mp3_stream_info(
    df: DataFrame, payload_col: str = "payload", id_cols: list[str] | None = None
) -> DataFrame:
    """Frame-layer triage over a binary MP3 column: one Arrow-batched
    ``mapInPandas`` pass → metadata columns (MP3_INFO_SCHEMA) keyed by
    ``id_cols``. Parse errors raise (executor-side) — a curation
    pipeline quarantines corrupt audio explicitly, upstream."""
    from gfw_data_api_spark.llmops.audio import frame_info_stage

    return frame_info_stage(df, parse_mp3, MP3_INFO_SCHEMA, payload_col, id_cols)
