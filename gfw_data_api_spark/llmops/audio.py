"""Audio columns: WAV/PCM decode + feature extraction, pure Python.

Closes the audio side of the multimodal codec seam
(llmops/multimodal.py): RIFF/WAVE containers with integer PCM
(8/16/24/32-bit) or IEEE float32/float64 samples decode natively, so
audio rows run the real pipeline instead of the ``fake=True``
pseudo-decode. Compressed codecs (MP3/AAC/Opus/μ-law...) still need
libav and keep raising NotImplementedError at the same boundary.

Reference parity: the reference has no audio path (it is a geospatial
API); this module is part of the beyond-reference training-data
pipeline family, mirroring how a 100 TB multimodal corpus carries
audio as opaque ``binary`` + typed metadata. All per-row work runs in
Arrow-batched ``mapInPandas`` stages — nothing driver-side — and the
extracted features are plain columns afterwards, so downstream
filtering/aggregation stays in Catalyst.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from gfw_data_api_spark.llmops import multimodal as _mm

_WAVE_FORMAT_PCM = 0x0001
_WAVE_FORMAT_IEEE_FLOAT = 0x0003
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload → ``(samples, sample_rate)``.

    ``samples`` is float64 with shape ``(n_frames, n_channels)``,
    normalized to [-1, 1]. Supports integer PCM at 8 (unsigned),
    16/24/32-bit (signed little-endian) and IEEE float32/float64, any
    channel count. WAVE_FORMAT_EXTENSIBLE unwraps to the inner format
    via the fmt extension's SubFormat tag prefix.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    pos = 12
    fmt = None
    frames = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + size > len(data):
            # loud-rejection policy (matches the other codecs): a chunk
            # whose declared size overruns the payload is a truncated or
            # corrupt container, not partial audio
            raise ValueError(
                f"not a WAV: chunk {cid!r} declares {size} bytes but only "
                f"{len(data) - pos - 8} remain"
            )
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt " and fmt is None:
            fmt = body
        elif cid == b"data" and frames is None:
            frames = body
        if fmt is not None and frames is not None:
            break  # first fmt/data pair wins; ignore trailing chunks
    if fmt is None or frames is None:
        raise ValueError("not a WAV: missing fmt/data chunk")
    if len(fmt) < 16:
        raise ValueError("not a WAV: truncated fmt chunk")
    audio_format, n_channels, sample_rate, _byte_rate, _block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if audio_format == _WAVE_FORMAT_EXTENSIBLE:
        if len(fmt) < 26:
            raise ValueError("WAVE_FORMAT_EXTENSIBLE fmt chunk too short")
        # SubFormat GUID: first two bytes are the wrapped format tag
        (audio_format,) = struct.unpack_from("<H", fmt, 24)
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("WAV fmt chunk has zero channels or rate")

    if audio_format == _WAVE_FORMAT_PCM:
        if bits == 8:
            raw = np.frombuffer(frames, dtype=np.uint8)
            samples = (raw.astype(np.float64) - 128.0) / 128.0
        elif bits == 16:
            raw = np.frombuffer(frames, dtype="<i2")
            samples = raw.astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(frames, dtype=np.uint8)
            b = b[: (len(b) // 3) * 3].reshape(-1, 3).astype(np.int64)
            vals = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            samples = vals.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            raw = np.frombuffer(frames, dtype="<i4")
            samples = raw.astype(np.float64) / float(1 << 31)
        else:
            raise NotImplementedError(f"PCM bit depth {bits} outside subset (8/16/24/32)")
    elif audio_format == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            samples = np.frombuffer(frames, dtype="<f4").astype(np.float64)
        elif bits == 64:
            samples = np.frombuffer(frames, dtype="<f8").astype(np.float64)
        else:
            raise NotImplementedError(f"float bit depth {bits} outside subset (32/64)")
    else:
        raise NotImplementedError(
            f"WAV format tag 0x{audio_format:04x} outside subset (PCM, IEEE float); "
            "compressed audio needs libav, unavailable here"
        )
    n = (len(samples) // n_channels) * n_channels
    return samples[:n].reshape(-1, n_channels), int(sample_rate)


def encode_wav(samples: np.ndarray, sample_rate: int, bits: int = 16) -> bytes:
    """Minimal WAV writer — fixture/export twin of ``decode_wav``.

    ``samples``: float array in [-1, 1], shape (n,) or (n, channels).
    Writes integer PCM at 16 bits (default) or IEEE float32 (bits=32f
    via ``bits=-32``).
    """
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    if bits == 16:
        fmt_tag, bps = _WAVE_FORMAT_PCM, 16
        payload = np.clip(np.round(arr * 32768.0), -32768, 32767).astype("<i2").tobytes()
    elif bits == -32:
        fmt_tag, bps = _WAVE_FORMAT_IEEE_FLOAT, 32
        payload = arr.astype("<f4").tobytes()
    elif bits == 8:
        fmt_tag, bps = _WAVE_FORMAT_PCM, 8
        payload = np.clip(np.round(arr * 128.0 + 128.0), 0, 255).astype(np.uint8).tobytes()
    else:
        raise NotImplementedError("encode_wav writes 8/16-bit PCM or float32 (bits=-32)")
    block_align = n_channels * bps // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_channels, sample_rate, sample_rate * block_align, block_align, bps
    )
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack(
        "<I", len(payload)
    ) + payload + (b"\x00" if len(payload) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def resample_linear(samples: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    """Linear-interpolation resample, per channel (vectorized numpy).

    The standard cheap resampler for feature pipelines (proper
    band-limited resampling needs a windowed-sinc kernel — same seam).
    """
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_in = arr.shape[0]
    if n_in == 0 or rate_in == rate_out:
        return arr
    n_out = max(1, int(round(n_in * rate_out / rate_in)))
    x_out = np.arange(n_out, dtype=np.float64) * (rate_in / rate_out)
    x_out = np.minimum(x_out, n_in - 1)
    return np.stack([np.interp(x_out, np.arange(n_in), arr[:, c]) for c in range(arr.shape[1])], axis=1)


AUDIO_FEATURE_SCHEMA_FIELDS = [
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.IntegerType()),
    T.StructField("audio_duration_ms", T.DoubleType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("peak", T.DoubleType()),
    T.StructField("zero_crossing_rate", T.DoubleType()),
    T.StructField("spectral_centroid_hz", T.DoubleType()),
    T.StructField("silence_ratio", T.DoubleType()),
]


def audio_signal_features(samples: np.ndarray, sample_rate: int) -> dict:
    """Classic signal features from a decoded (n, ch) float array.

    Channel-mean mono mixdown first; centroid via one rFFT. These are
    the cheap quality signals a corpus-curation pass filters on
    (silence, clipping, duration) before any expensive model runs.
    """
    mono = np.asarray(samples, dtype=np.float64).mean(axis=1) if samples.ndim == 2 else samples
    n = len(mono)
    if n == 0:
        return {
            "sample_rate": int(sample_rate),
            "n_samples": 0,
            "audio_duration_ms": 0.0,
            "rms": 0.0,
            "peak": 0.0,
            "zero_crossing_rate": 0.0,
            "spectral_centroid_hz": 0.0,
            "silence_ratio": 1.0,
        }
    rms = float(np.sqrt(np.mean(mono**2)))
    peak = float(np.max(np.abs(mono)))
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    total = float(mag.sum())
    centroid = float((freqs * mag).sum() / total) if total > 0 else 0.0
    silence = float(np.mean(np.abs(mono) < 1e-3))
    return {
        "sample_rate": int(sample_rate),
        "n_samples": int(n),
        "audio_duration_ms": 1000.0 * n / sample_rate,
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
        "spectral_centroid_hz": centroid,
        "silence_ratio": silence,
    }


def mel_filterbank(n_mels: int, n_bins: int, sample_rate: int) -> np.ndarray:
    """Triangular mel filterbank matrix (n_mels × n_bins), HTK mel scale
    ``m = 2595·log10(1 + f/700)`` — the standard front-end for speech
    features (MFCC = DCT of these log-energies)."""
    f_max = sample_rate / 2.0
    mel_max = 2595.0 * np.log10(1.0 + f_max / 700.0)
    mel_pts = np.linspace(0.0, mel_max, n_mels + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bins = np.floor((n_bins - 1) * hz_pts / f_max).astype(int)
    fb = np.zeros((n_mels, n_bins))
    for m in range(n_mels):
        lo, mid, hi = bins[m], bins[m + 1], bins[m + 2]
        if mid == lo:
            mid = lo + 1
        if hi == mid:
            hi = mid + 1
        fb[m, lo:mid] = (np.arange(lo, mid) - lo) / (mid - lo)
        fb[m, mid : min(hi, n_bins)] = (hi - np.arange(mid, min(hi, n_bins))) / (hi - mid)
    return fb


def mel_log_energies(
    samples: np.ndarray,
    sample_rate: int,
    n_mels: int = 16,
    n_frames: int = 8,
) -> np.ndarray:
    """(n_frames × n_mels) log mel-band energies — the acoustic feature
    grid a speech/audio curation pass clusters or classifies on. Mono
    mixdown, equal non-overlapping frames, rFFT power, triangular mel
    pooling, log with a small floor."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    if len(mono) < n_frames:
        mono = np.pad(mono, (0, n_frames - len(mono)))
    frame_len = len(mono) // n_frames
    spec = np.abs(np.fft.rfft(mono[: frame_len * n_frames].reshape(n_frames, frame_len), axis=1)) ** 2
    fb = mel_filterbank(n_mels, spec.shape[1], sample_rate)
    return np.log(spec @ fb.T + 1e-10)


def extract_mel_features(
    df: DataFrame,
    payload_col: str = "payload",
    n_mels: int = 16,
    n_frames: int = 8,
) -> DataFrame:
    """Append ``mel array<float>`` (flattened frames×mels grid) per WAV
    payload via mapInPandas — the embedding-ish column the similarity
    family (cosine top-k, IVF, near-dup buckets) consumes directly."""
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("mel", T.ArrayType(T.FloatType()))]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mels = []
            for payload in pdf[payload_col]:
                if payload is None:
                    mels.append(None)
                    continue
                try:
                    samples, rate = decode_wav(bytes(payload))
                    grid = mel_log_energies(samples, rate, n_mels, n_frames)
                    mels.append([float(x) for x in grid.ravel()])
                except _mm.DECODE_ERRORS:
                    mels.append(None)
            pdf = pdf.copy()
            pdf["mel"] = mels
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def audio_fingerprint64(samples: np.ndarray, sample_rate: int) -> int:
    """64-bit perceptual audio fingerprint (Haitsma & Kalker 2002 shape).

    Mono mixdown → 9 equal non-overlapping frames → rFFT energy in 9
    log-spaced bands per frame → one bit per (frame, band) cell from the
    sign of the time-and-band energy difference
    ``(E[f,b] − E[f,b+1]) − (E[f−1,b] − E[f−1,b+1])`` (8×8 = 64 bits).

    Uniform gain scaling multiplies every energy by g², which preserves
    every difference's sign — the fingerprint is volume-invariant, the
    audio analog of dHash's brightness invariance. Banded near-dup pairs
    reuse the SimHash pigeonhole machinery via
    :func:`llmops.phash.perceptual_neardup_pairs` on the output column.
    """
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n_frames, n_bands = 9, 9
    if len(mono) < n_frames:
        mono = np.pad(mono, (0, n_frames - len(mono)))
    frame_len = len(mono) // n_frames
    spec = np.abs(np.fft.rfft(mono[: frame_len * n_frames].reshape(n_frames, frame_len), axis=1)) ** 2
    n_bins = spec.shape[1]
    # log-spaced band edges over the spectrum (skip DC bin)
    edges = np.unique(
        np.clip(np.geomspace(1, max(n_bins - 1, 2), n_bands + 1).astype(int), 1, n_bins)
    )
    while len(edges) < n_bands + 1:  # tiny spectra: pad edges forward
        edges = np.append(edges, min(edges[-1] + 1, n_bins))
    energies = np.stack(
        [spec[:, edges[b] : max(edges[b + 1], edges[b] + 1)].sum(axis=1) for b in range(n_bands)],
        axis=1,
    )  # (frames, bands)
    band_diff = energies[:, :-1] - energies[:, 1:]          # (frames, bands-1)
    bits = (band_diff[1:] - band_diff[:-1]) > 0              # (frames-1, bands-1) = 8×8
    from gfw_data_api_spark.llmops.phash import _pack_bits

    return _pack_bits(bits)


def audio_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """Append a 64-bit perceptual ``afp`` (long) per WAV payload via
    mapInPandas; undecodable rows get NULL (codec-family convention).
    Near-dups: ``perceptual_neardup_pairs(out, "afp", id_col=...)``."""
    from pyspark.sql import types as _T

    out_schema = _T.StructType(
        list(df.schema.fields) + [_T.StructField("afp", _T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fps = []
            for payload in pdf[payload_col]:
                if payload is None:
                    fps.append(None)
                    continue
                try:
                    samples, rate = decode_wav(bytes(payload))
                    fps.append(audio_fingerprint64(samples, rate))
                except _mm.DECODE_ERRORS:
                    fps.append(None)
            pdf = pdf.copy()
            pdf["afp"] = fps
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
) -> DataFrame:
    """Decode WAV payloads and append signal-feature columns.

    mapInPandas over Arrow batches: each partition decodes its own rows,
    no shuffle, no driver collection — the plan is scan → project, so a
    100 TB audio table parallelizes by file split exactly like any other
    scan. Undecodable rows (non-WAV, compressed) get NULL features
    rather than failing the batch, matching extract_features' None
    convention for absent payloads.
    """
    out_schema = T.StructType(list(df.schema.fields) + AUDIO_FEATURE_SCHEMA_FIELDS)
    names = [f.name for f in AUDIO_FEATURE_SCHEMA_FIELDS]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {name: [] for name in names}
            for payload in pdf[payload_col]:
                feats = None
                if payload is not None:
                    try:
                        samples, rate = decode_wav(bytes(payload))
                        feats = audio_signal_features(samples, rate)
                    except _mm.DECODE_ERRORS:
                        feats = None
                for name in names:
                    cols[name].append(None if feats is None else feats[name])
            pdf = pdf.copy()
            for name in names:
                pdf[name] = cols[name]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_info_stage(
    df: DataFrame,
    parse_fn,
    info_schema: T.StructType,
    payload_col: str = "payload",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Shared plumbing for container frame-layer parsers (MP3 ADTS,
    AAC ADTS, future formats): one Arrow-batched ``mapInPandas`` pass
    applying ``parse_fn(bytes) -> dict`` per row → the parser's
    metadata columns keyed by ``id_cols``. Parse errors raise
    (executor-side) — a curation pipeline quarantines corrupt media
    explicitly, upstream."""
    id_cols = list(id_cols or [c for c in df.columns if c != payload_col])
    schema = T.StructType(
        [f for f in df.schema.fields if f.name in id_cols] + list(info_schema)
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                info = parse_fn(bytes(r[payload_col]))
                rows.append({**{c: r[c] for c in id_cols}, **info})
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.mapInPandas(gen, schema)
