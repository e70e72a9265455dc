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
API); this is the beyond-reference training-data family. Round 7
extends the walker from MPEG-1 Layer III to the FULL public header
matrix — MPEG-1/2/2.5 × Layers I/II/III (the bitrate/sample-rate
tables and frame-length arithmetic are all in the same public header
format) — removing the most common loud-reject in wild audio corpora
(22.05 kHz MPEG-2 files). Free-format bitrate and the reserved
version/layer codes still reject loudly.
"""

from __future__ import annotations

import struct

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Header version bits → version name ("1", "2", "2.5"); 0b01 reserved.
_VERSIONS = {0b00: "2.5", 0b10: "2", 0b11: "1"}
# Header layer bits → layer number; 0b00 reserved.
_LAYERS = {0b11: 1, 0b10: 2, 0b01: 3}

# Bitrate tables, kbps, by (version group, layer); index 1..14
# (0 = free-format, 15 = invalid — both rejected). MPEG-2 and 2.5
# share one group; MPEG-2 Layers II and III share one row.
_V2_L23 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_BITRATES = {
    ("1", 1): (None, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    ("1", 2): (None, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    ("1", 3): (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
    ("2", 1): (None, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    ("2", 2): _V2_L23,
    ("2", 3): _V2_L23,
}

# Sample-rate tables by version, index 0..2 (3 reserved).
_SAMPLE_RATES_V = {
    "1": (44100, 48000, 32000),
    "2": (22050, 24000, 16000),
    "2.5": (11025, 12000, 8000),
}
# Back-compat aliases (fixture builders and tests import these).
_BITRATE_KBPS = _BITRATES[("1", 3)]
_SAMPLE_RATES = _SAMPLE_RATES_V["1"]
_SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III

_CHANNEL_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def samples_per_frame(version: str, layer: int) -> int:
    """Layer I: 384 always; Layer II: 1152 always; Layer III: 1152 in
    MPEG-1, 576 in MPEG-2/2.5 (the low-sample-rate profile halves the
    granule count)."""
    if layer == 1:
        return 384
    if layer == 2:
        return 1152
    return 1152 if version == "1" else 576


def frame_length(
    bitrate_kbps: int,
    sample_rate: int,
    padding: int,
    version: str = "1",
    layer: int = 3,
) -> int:
    """MPEG audio frame byte length. Layer I counts in 4-byte slots:
    ``(12 * bitrate/rate + pad) * 4``; Layers II/III use
    ``spf/8 * bitrate/rate + pad`` (144 for 1152 samples, 72 for
    MPEG-2/2.5 Layer III's 576), truncated, one padding slot."""
    if layer == 1:
        return (12_000 * bitrate_kbps // sample_rate + padding) * 4
    spf = samples_per_frame(version, layer)
    return (spf // 8) * 1_000 * bitrate_kbps // sample_rate + padding


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


def parse_frame_header(data: bytes, pos: int, free_length: int | None = None) -> dict:
    """Parse one 32-bit MPEG audio frame header at ``pos`` — any of
    MPEG-1/2/2.5 × Layers I/II/III. Raises on the reserved codes.

    Free-format bitrate (index 0): the header carries no length, so a
    bare header parse raises — but :func:`parse_mp3` derives the
    stream's constant frame length from the first next-sync scan
    (round-8, VERDICT r7 #9) and passes it as ``free_length`` (the
    PADDING-EXCLUDED base length); the frame then reports
    ``bitrate_kbps`` 0 and ``length = free_length + padding·slot``
    (slot = 4 bytes for Layer I, 1 otherwise, like the tabled
    formula)."""
    if pos + 4 > len(data):
        raise ValueError("truncated MP3: header runs past end of payload")
    b0, b1, b2, b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        raise ValueError(f"lost MP3 frame sync at byte {pos}")
    vbits = (b1 >> 3) & 0x3
    lbits = (b1 >> 1) & 0x3
    if vbits not in _VERSIONS:
        raise ValueError(f"reserved MPEG version code at byte {pos}")
    if lbits not in _LAYERS:
        raise ValueError(f"reserved MPEG layer code at byte {pos}")
    version = _VERSIONS[vbits]
    layer = _LAYERS[lbits]
    group = "1" if version == "1" else "2"
    crc = (b1 & 0x1) == 0  # protection bit 0 → 16-bit CRC follows header
    bitrate_idx = (b2 >> 4) & 0xF
    if bitrate_idx == 0 and free_length is None:
        raise NotImplementedError(
            "free-format bitrate needs the stream-derived frame length "
            "(parse_mp3 provides it)"
        )
    if bitrate_idx != 0 and free_length is not None:
        raise ValueError(
            f"tabled bitrate inside a free-format stream at byte {pos} "
            "(free format must be constant — corrupt MP3)"
        )
    if bitrate_idx == 0xF:
        raise ValueError(f"invalid MP3 bitrate index 15 at byte {pos}")
    rate_idx = (b2 >> 2) & 0x3
    if rate_idx == 0x3:
        raise ValueError(f"reserved MP3 sample-rate index at byte {pos}")
    padding = (b2 >> 1) & 0x1
    mode = (b3 >> 6) & 0x3
    kbps = 0 if bitrate_idx == 0 else _BITRATES[(group, layer)][bitrate_idx]
    rate = _SAMPLE_RATES_V[version][rate_idx]
    if layer == 3:
        # Layer III side info (after the optional CRC) — where the
        # Xing/Info VBR tag sits: MPEG-1 17/32 mono/other, MPEG-2(.5)
        # 9/17
        side = (17 if mode == 0b11 else 32) if version == "1" else (
            9 if mode == 0b11 else 17
        )
    else:
        side = 0  # Layers I/II carry no Layer-III side info
    if bitrate_idx == 0:
        length = free_length + padding * (4 if layer == 1 else 1)
    else:
        length = frame_length(kbps, rate, padding, version, layer)
    return {
        "version": version,
        "layer": layer,
        "crc": crc,
        "bitrate_kbps": kbps,
        "sample_rate": rate,
        "padding": padding,
        "channel_mode": _CHANNEL_MODES[mode],
        "length": length,
        "samples": samples_per_frame(version, layer),
        "side_info": side,
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
    """Walk every frame of an MPEG audio stream (any version × layer)
    → summary dict.

    Skips a leading ID3v2 tag and a trailing 128-byte ID3v1 ``TAG``
    block; anything else that breaks the frame walk raises (strict —
    truncated/corrupt containers must not pass as shorter audio).

    Returns: mpeg_version ("1"/"2"/"2.5"), layer (1/2/3), n_frames,
    total_samples, duration_us (exact integer arithmetic at the stream
    sample rate), sample_rate, channel_mode, is_vbr (any bitrate
    change across frames), sum_kbps (sum of per-frame bitrates —
    exact, so averages stay rational), audio_bytes, xing_frames
    (declared VBR-header count or None; Layer III only).
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
    first = None
    vbr = False
    xing = None
    # free-format stream (bitrate index 0 in the first header): the
    # spec signals NO length — decoders derive the constant frame size
    # by scanning for the next sync whose header matches the first
    # (round-8). Padding still adds one slot per flagged frame, so the
    # scan result minus frame-0's padding slot is the base length.
    free_base: int | None = None
    if (
        end - start >= 4
        and data[start] == 0xFF
        and (data[start + 1] & 0xE0) == 0xE0
        and (data[start + 2] >> 4) & 0xF == 0
    ):
        free_base = _free_format_base_length(data, start, end)
    while pos < end:
        hdr = parse_frame_header(data, pos, free_length=free_base)
        if pos + hdr["length"] > end:
            raise ValueError(
                f"truncated MP3: frame {n} declares {hdr['length']} bytes "
                f"but only {end - pos} remain"
            )
        if n == 0:
            first = hdr
            xing = _xing_frame_count(data, pos, hdr) if hdr["layer"] == 3 else None
        else:
            for field, what in (
                ("version", "MPEG version"),
                ("layer", "layer"),
                ("sample_rate", "sample-rate"),
                ("channel_mode", "channel-mode"),
            ):
                if hdr[field] != first[field]:
                    raise ValueError(f"{what} change mid-stream (corrupt MP3)")
            if hdr["bitrate_kbps"] != first["bitrate_kbps"]:
                vbr = True
        sum_kbps += hdr["bitrate_kbps"]
        pos += hdr["length"]
        n += 1
    spf = first["samples"]
    return {
        "mpeg_version": first["version"],
        "layer": first["layer"],
        "n_frames": n,
        "total_samples": n * spf,
        "duration_us": n * spf * 1_000_000 // first["sample_rate"],
        "sample_rate": first["sample_rate"],
        "channel_mode": first["channel_mode"],
        "is_vbr": vbr,
        "sum_kbps": sum_kbps,
        "audio_bytes": pos - start,
        "xing_frames": xing,
        "free_frame_bytes": free_base,
    }


def _free_format_base_length(data: bytes, start: int, end: int) -> int:
    """Constant frame length of a free-format stream: distance from
    the first header to the NEXT sync whose header fields match it
    (the standard decoder recipe — ISO 11172-3 leaves the length
    unsignaled), minus frame 0's padding slot. Raises when no second
    matching sync exists inside the spec's ceiling — one ambiguous
    frame must not pass as parsed audio."""
    b1, b2, b3 = data[start + 1], data[start + 2], data[start + 3]
    pad0 = (b2 >> 1) & 0x1
    layer = _LAYERS[(b1 >> 1) & 0x3]
    slot = 4 if layer == 1 else 1
    # spec ceiling: free-format bitrate may legally reach 448 kbps —
    # bound the scan at the longest legal frame plus one padding slot
    vbits = (b1 >> 3) & 0x3
    version = _VERSIONS[vbits]
    rate = _SAMPLE_RATES_V[version][(b2 >> 2) & 0x3]
    limit = min(end, start + frame_length(448, rate, 1, version, layer) + slot)
    j = start + 4
    while j + 4 <= limit:
        if (
            data[j] == 0xFF
            and (data[j + 1] & 0xE0) == 0xE0
            and data[j + 1] == b1  # version/layer/protection match
            and (data[j + 2] & 0xFC) == (b2 & 0xFC)  # bitrate=0 + rate match
            and (data[j + 3] & 0xC0) == (b3 & 0xC0)  # channel mode match
        ):
            return j - start - pad0 * slot
        j += 1
    raise ValueError(
        "free-format MP3: no second matching sync within the legal "
        "frame-length ceiling (single-frame or corrupt stream)"
    )


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


_VERSION_BITS = {"1": 0b11, "2": 0b10, "2.5": 0b00}
_LAYER_BITS = {1: 0b11, 2: 0b10, 3: 0b01}


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
    version: str = "1",
    layer: int = 3,
    free_frame_len: int | None = None,
) -> bytes:
    """Fixture builder: a syntactically-exact MPEG audio stream (any
    version × layer; default MPEG-1 Layer III) with the requested
    per-frame bitrates/padding, deterministic filler main data (NOT
    meaningful audio — decode is out of subset), an optional Xing
    count in frame 0 (Layer III only), and optional ID3 tags. The byte
    layout mirrors what :func:`parse_mp3` must invert; the m10/m12
    gates' oracles recompute every length from the planted parameters
    arithmetically, so the frame-length formulas are cross-checked by
    an independent engine rather than round-trip alone."""
    out = bytearray()
    if id3v2_bytes:
        body = bytes((fill_seed + i) % 251 for i in range(id3v2_bytes))
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3v2_bytes >> 21) & 0x7F, (id3v2_bytes >> 14) & 0x7F,
             (id3v2_bytes >> 7) & 0x7F, id3v2_bytes & 0x7F]
        ) + body
    group = "1" if version == "1" else "2"
    rate_idx = _SAMPLE_RATES_V[version].index(sample_rate)
    brtable = _BITRATES[(group, layer)]
    for j, kbps in enumerate(frame_kbps):
        pad = pad_mask[j] if pad_mask else 0
        # kbps 0 = free format (round-8): bitrate index 0 in the header,
        # frame bytes come from free_frame_len (+ padding slot)
        if kbps == 0:
            if free_frame_len is None:
                raise ValueError("free-format frames need free_frame_len")
            bidx = 0
        else:
            bidx = brtable.index(kbps)
        b0 = 0xFF
        b1 = (
            0xE0
            | (_VERSION_BITS[version] << 3)
            | (_LAYER_BITS[layer] << 1)
            | (0 if with_crc else 1)
        )
        b2 = (bidx << 4) | (rate_idx << 2) | (pad << 1)
        b3 = (0b11 << 6) if mono else 0x00  # stereo mode bits 00
        frame = bytearray([b0, b1, b2, b3])
        if with_crc:
            frame += bytes([(fill_seed + j) % 251, (fill_seed + j + 1) % 251])
        if kbps == 0:
            total = free_frame_len + pad * (4 if layer == 1 else 1)
        else:
            total = frame_length(kbps, sample_rate, pad, version, layer)
        if layer == 3:
            side = (17 if mono else 32) if version == "1" else (9 if mono else 17)
            frame += bytes(side)  # zeroed side info (no bit reservoir)
        if j == 0 and xing_count is not None:
            if layer != 3:
                raise ValueError("Xing headers live in Layer III side info")
            frame += b"Xing" + struct.pack(">II", 0x1, xing_count)
        while len(frame) < total:
            frame.append((fill_seed + j * 7 + len(frame)) % 251)
        if len(frame) > total:
            raise ValueError(
                f"frame {j} overflow: side info + headers exceed {total} bytes"
            )
        out += frame
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)


MP3_INFO_SCHEMA = T.StructType(
    [
        T.StructField("mpeg_version", T.StringType()),
        T.StructField("layer", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_samples", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channel_mode", T.StringType()),
        T.StructField("is_vbr", T.BooleanType()),
        T.StructField("sum_kbps", T.LongType()),
        T.StructField("audio_bytes", T.LongType()),
        T.StructField("xing_frames", T.LongType()),
        T.StructField("free_frame_bytes", T.LongType()),
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
