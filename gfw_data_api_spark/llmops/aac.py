"""AAC ADTS frame-layer parsing, pure Python.

Companion to :mod:`gfw_data_api_spark.llmops.mp3`: the other half of
the audio-container seam named in llmops/audio.py. A 100 TB multimodal
corpus triages AAC the same way it triages MP3 — duration, sample
rate, channel layout, byte accounting, CBR/VBR shape — and all of that
lives in the ADTS (Audio Data Transport Stream) fixed+variable header,
publicly specified in ISO/IEC 13818-7 §6.2 and carried unchanged into
ISO/IEC 14496-3. This module walks that header layer natively and
exposes it as an Arrow-batched ``mapInPandas`` stage.

PCM decode stays a documented NotImplementedError seam
(:func:`decode_aac`): AAC spectral data is entropy-coded with the 11
spectral Huffman codebooks plus the scalefactor codebook from the spec
annex — DATA tables, not derivable, unavailable offline. Same
loud-reject-over-silent-garbage policy as decode_mp3 and the FileGDB
CDF no-go (docs/PARITY.md).

Reference parity: the reference has no audio path (it is a geospatial
API); this is the beyond-reference training-data family. Subset:
AAC-LC (profile 01) in ADTS framing, explicit channel configuration
1..7, sampling-frequency indices 0..12. Other profiles, inband-PCE
channel config 0, and reserved/forbidden frequency indices reject
loudly with the profile named.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gfw_data_api_spark.llmops.mp3 import _id3v2_size

# ISO/IEC 13818-7 Table 35 — sampling_frequency_index 0..12; 13/14 are
# reserved, 15 means "escape / forbidden in ADTS"
_SAMPLE_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)
_PROFILES = ("main", "lc", "ssr", "ltp")
_SAMPLES_PER_BLOCK = 1024  # AAC long frame, per raw_data_block
_VBR_FULLNESS = 0x7FF  # adts_buffer_fullness escape value = VBR stream


def parse_adts_header(data: bytes, pos: int) -> dict:
    """Parse one 7-byte ADTS fixed+variable header at ``pos``. Raises
    on anything outside the AAC-LC/ADTS subset — silently resyncing is
    how corrupt corpora hide."""
    if pos + 7 > len(data):
        raise ValueError("truncated ADTS: header runs past end of payload")
    b = data[pos : pos + 7]
    if b[0] != 0xFF or (b[1] & 0xF0) != 0xF0:
        raise ValueError(f"lost ADTS frame sync at byte {pos}")
    layer = (b[1] >> 1) & 0x3
    if layer != 0:
        raise ValueError(f"invalid ADTS layer {layer} at byte {pos} (must be 0)")
    crc = (b[1] & 0x1) == 0  # protection_absent 0 → 16-bit CRC follows
    profile = (b[2] >> 6) & 0x3
    if profile != 0b01:
        raise NotImplementedError(
            f"AAC profile '{_PROFILES[profile]}' outside subset (AAC-LC only)"
        )
    rate_idx = (b[2] >> 2) & 0xF
    if rate_idx >= 13:
        raise ValueError(
            f"reserved/forbidden ADTS sampling-frequency index {rate_idx} "
            f"at byte {pos}"
        )
    channels = ((b[2] & 0x1) << 2) | ((b[3] >> 6) & 0x3)
    if channels == 0:
        raise NotImplementedError(
            "ADTS channel_configuration 0 (inband PCE) outside subset"
        )
    length = ((b[3] & 0x3) << 11) | (b[4] << 3) | ((b[5] >> 5) & 0x7)
    fullness = ((b[5] & 0x1F) << 6) | ((b[6] >> 2) & 0x3F)
    blocks = (b[6] & 0x3) + 1  # number_of_raw_data_blocks_in_frame + 1
    if length < 7 + (2 if crc else 0):
        raise ValueError(
            f"ADTS frame length {length} at byte {pos} smaller than its header"
        )
    return {
        "crc": crc,
        "mpeg2": (b[1] >> 3) & 0x1 == 1,  # ID bit: 1 = MPEG-2, 0 = MPEG-4
        "sample_rate": _SAMPLE_RATES[rate_idx],
        "channels": channels,
        "length": length,
        "fullness": fullness,
        "blocks": blocks,
    }


def parse_adts(data: bytes) -> dict:
    """Walk every ADTS frame of an AAC-LC stream → summary dict.

    Skips a leading ID3v2 tag (some encoders prepend one to raw .aac
    files); anything else that breaks the frame walk raises (strict —
    truncated/corrupt containers must not pass as shorter audio).

    Returns: n_frames, n_blocks (raw_data_blocks across all frames),
    total_samples (1024 per block), duration_us (exact integer
    arithmetic at the stream rate), sample_rate, channel_config,
    profile (always 'lc' in-subset), is_vbr (any frame declares the
    0x7FF buffer-fullness escape), audio_bytes (sum of declared frame
    lengths — cross-checks the 13-bit length field against the walk).
    """
    start = _id3v2_size(data)
    pos = start
    end = len(data)
    if pos >= end:
        raise ValueError("not ADTS: no audio bytes outside tags")
    n = 0
    blocks = 0
    rate = None
    channels = None
    vbr = False
    while pos < end:
        hdr = parse_adts_header(data, pos)
        if pos + hdr["length"] > end:
            raise ValueError(
                f"truncated ADTS: frame {n} declares {hdr['length']} bytes "
                f"but only {end - pos} remain"
            )
        if n == 0:
            rate = hdr["sample_rate"]
            channels = hdr["channels"]
        else:
            if hdr["sample_rate"] != rate:
                raise ValueError("sample-rate change mid-stream (corrupt ADTS)")
            if hdr["channels"] != channels:
                raise ValueError("channel-config change mid-stream (corrupt ADTS)")
        if hdr["fullness"] == _VBR_FULLNESS:
            vbr = True
        blocks += hdr["blocks"]
        pos += hdr["length"]
        n += 1
    return {
        "n_frames": n,
        "n_blocks": blocks,
        "total_samples": blocks * _SAMPLES_PER_BLOCK,
        "duration_us": blocks * _SAMPLES_PER_BLOCK * 1_000_000 // rate,
        "sample_rate": rate,
        "channel_config": channels,
        "profile": "lc",
        "is_vbr": vbr,
        "audio_bytes": pos - start,
    }


def decode_aac(data: bytes):  # pragma: no cover - documented seam
    """PCM decode is OUT of the offline-implementable subset: AAC-LC
    spectral data needs the 11 spectral Huffman codebooks and the
    scalefactor codebook from ISO/IEC 13818-7's annex — spec DATA,
    unavailable offline, and wrong-table output would be
    silently-garbled audio. Same policy as decode_mp3 and the FileGDB
    CDF no-go (docs/PARITY.md): loud reject over silent garbage. The
    frame layer (:func:`parse_adts`) is fully supported."""
    raise NotImplementedError(
        "AAC PCM decode needs the ISO 13818-7 Huffman codebooks (spec "
        "data not available offline); parse_adts provides the "
        "frame-layer metadata, or transcode to WAV upstream for "
        "decode_wav"
    )


def build_adts(
    payload_bytes: list[int],
    sample_rate: int = 48000,
    channels: int = 2,
    with_crc: bool = False,
    vbr: bool = False,
    blocks_per_frame: list[int] | None = None,
    mpeg2: bool = False,
    id3v2_bytes: int = 0,
    fill_seed: int = 0,
) -> bytes:
    """Fixture builder: a syntactically-exact AAC-LC ADTS stream with
    one frame per ``payload_bytes`` entry, deterministic filler payload
    (NOT meaningful audio — decode is out of subset), optional CRC
    slots, the 0x7FF buffer-fullness escape when ``vbr``, and an
    optional leading ID3v2 tag. The byte layout mirrors what
    :func:`parse_adts` must invert; the m11 gate's oracle recomputes
    every length and duration from the planted parameters
    arithmetically, so the 13-bit length packing and the block/sample
    accounting are cross-checked by an independent engine rather than
    round-trip alone."""
    out = bytearray()
    if id3v2_bytes:
        body = bytes((fill_seed + i) % 251 for i in range(id3v2_bytes))
        out += b"ID3\x04\x00\x00" + bytes(
            [(id3v2_bytes >> 21) & 0x7F, (id3v2_bytes >> 14) & 0x7F,
             (id3v2_bytes >> 7) & 0x7F, id3v2_bytes & 0x7F]
        ) + body
    rate_idx = _SAMPLE_RATES.index(sample_rate)
    if not 1 <= channels <= 7:
        raise ValueError(f"channel_configuration {channels} outside 1..7")
    fullness = _VBR_FULLNESS if vbr else 0x123
    for j, nbytes in enumerate(payload_bytes):
        rdb = (blocks_per_frame[j] if blocks_per_frame else 1) - 1
        if not 0 <= rdb <= 3:
            raise ValueError("blocks_per_frame entries must be 1..4")
        length = 7 + (2 if with_crc else 0) + nbytes
        if length > 0x1FFF:
            raise ValueError(f"frame {j}: length {length} exceeds 13-bit field")
        frame = bytearray(
            [
                0xFF,
                0xF0 | ((1 if mpeg2 else 0) << 3) | (0 if with_crc else 1),
                (0b01 << 6) | (rate_idx << 2) | ((channels >> 2) & 0x1),
                ((channels & 0x3) << 6) | ((length >> 11) & 0x3),
                (length >> 3) & 0xFF,
                ((length & 0x7) << 5) | ((fullness >> 6) & 0x1F),
                ((fullness & 0x3F) << 2) | rdb,
            ]
        )
        if with_crc:
            frame += bytes([(fill_seed + j) % 251, (fill_seed + j + 1) % 251])
        frame += bytes((fill_seed + j * 7 + i) % 251 for i in range(nbytes))
        out += frame
    return bytes(out)


ADTS_INFO_SCHEMA = T.StructType(
    [
        T.StructField("n_frames", T.LongType()),
        T.StructField("n_blocks", T.LongType()),
        T.StructField("total_samples", T.LongType()),
        T.StructField("duration_us", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("channel_config", T.LongType()),
        T.StructField("profile", T.StringType()),
        T.StructField("is_vbr", T.BooleanType()),
        T.StructField("audio_bytes", T.LongType()),
    ]
)


def adts_stream_info(
    df: DataFrame, payload_col: str = "payload", id_cols: list[str] | None = None
) -> DataFrame:
    """Frame-layer triage over a binary ADTS/AAC column: one
    Arrow-batched ``mapInPandas`` pass → metadata columns
    (ADTS_INFO_SCHEMA) keyed by ``id_cols``. Parse errors raise
    (executor-side) — a curation pipeline quarantines corrupt audio
    explicitly, upstream."""
    from gfw_data_api_spark.llmops.audio import frame_info_stage

    return frame_info_stage(df, parse_adts, ADTS_INFO_SCHEMA, payload_col, id_cols)
