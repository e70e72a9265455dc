"""Audio (WAV) and video (MJPEG-AVI) codec + pipeline tests.

Covers the round-4 closure of the audio/video side of the multimodal
codec seam: pure-Python WAV decode/encode roundtrips, signal features,
AVI container parse + frame sampling with the JPEG codec, and the real
(decode=True) bilinear resize path.
"""

import numpy as np
import pytest

from gfw_data_api_spark.llmops import audio, multimodal, video


# ---------------------------------------------------------------- WAV


def test_wav_roundtrip_16bit_stereo():
    rng = np.random.default_rng(11)
    samples = rng.uniform(-0.9, 0.9, size=(480, 2))
    data = audio.encode_wav(samples, 48_000, bits=16)
    out, rate = audio.decode_wav(data)
    assert rate == 48_000
    assert out.shape == (480, 2)
    assert np.allclose(out, samples, atol=1.0 / 32768)


def test_wav_roundtrip_float32_mono():
    t = np.arange(1000) / 8000.0
    samples = 0.5 * np.sin(2 * np.pi * 440 * t)
    data = audio.encode_wav(samples, 8000, bits=-32)
    out, rate = audio.decode_wav(data)
    assert rate == 8000
    assert out.shape == (1000, 1)
    assert np.allclose(out[:, 0], samples, atol=1e-6)


def test_wav_roundtrip_8bit():
    samples = np.linspace(-1, 1, 256)
    data = audio.encode_wav(samples, 16_000, bits=8)
    out, rate = audio.decode_wav(data)
    assert np.allclose(out[:, 0], samples, atol=1.0 / 127)


def test_wav_24bit_decode():
    # hand-build a 24-bit PCM file: values -2^23, 0, 2^23-1
    import struct

    vals = [-(1 << 23), 0, (1 << 23) - 1]
    payload = b"".join(struct.pack("<i", v)[:3] for v in vals)
    fmt = struct.pack("<HHIIHH", 1, 1, 44100, 44100 * 3, 3, 24)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload + b"\x00"
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = audio.decode_wav(data)
    assert rate == 44100
    assert np.allclose(out[:, 0], [-1.0, 0.0, (2**23 - 1) / 2**23])


def test_wav_extensible_unwraps_pcm():
    import struct

    samples = np.array([0.0, 0.5, -0.5])
    base = audio.encode_wav(samples, 22_050, bits=16)
    # rebuild with a WAVE_FORMAT_EXTENSIBLE fmt chunk wrapping PCM
    payload = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2").tobytes()
    fmt = (
        struct.pack("<HHIIHH", 0xFFFE, 1, 22_050, 44_100, 2, 16)
        + struct.pack("<HHI", 22, 16, 0x4)  # cbSize, validBits, channelMask
        + struct.pack("<H", 1)  # SubFormat GUID tag prefix: PCM
        + b"\x00" * 14
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    out, rate = audio.decode_wav(data)
    ref, _ = audio.decode_wav(base)
    assert np.allclose(out, ref)


def test_wav_rejects_compressed_format():
    import struct

    fmt = struct.pack("<HHIIHH", 0x0055, 1, 44100, 0, 0, 0)  # MP3 tag
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", 0)
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(NotImplementedError):
        audio.decode_wav(data)


def test_wav_rejects_overrunning_chunk_size():
    """A chunk whose declared size extends past the payload is a
    truncated container — loud rejection, not silently partial audio."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 1000) + b"\x00\x00"  # claims 1000, has 2
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="declares 1000 bytes"):
        audio.decode_wav(data)


def test_wav_first_fmt_data_pair_wins():
    """Duplicate fmt/data chunks: decode the FIRST pair (spec-canonical
    stream), never a trailing imposter."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    good = struct.pack("<4h", 1000, -1000, 2000, -2000)
    bad = struct.pack("<2h", 9999, 9999)
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(good)) + good
        + b"data" + struct.pack("<I", len(bad)) + bad
    )
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    samples, rate = audio.decode_wav(data)
    assert rate == 8000
    assert samples.shape == (4, 1)
    np.testing.assert_allclose(samples[:, 0] * 32768.0, [1000, -1000, 2000, -2000])


def test_resample_linear_halves_length():
    t = np.arange(800) / 800.0
    sig = np.sin(2 * np.pi * 5 * t)
    out = audio.resample_linear(sig, 16_000, 8_000)
    assert out.shape == (400, 1)
    # same waveform shape at half the sample count
    assert np.allclose(out[::50, 0], sig[::100], atol=0.01)


def test_audio_signal_features_sine():
    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    f = audio.audio_signal_features(sig[:, None], rate)
    assert f["audio_duration_ms"] == pytest.approx(1000.0)
    assert f["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
    assert f["peak"] == pytest.approx(0.5, rel=1e-3)
    # 440 Hz sine crosses zero 880 times/sec → zcr ≈ 880/8000
    assert f["zero_crossing_rate"] == pytest.approx(880 / rate, rel=0.01)
    assert f["spectral_centroid_hz"] == pytest.approx(440, rel=0.05)
    # a sine spends ~2/π·asin(thresh/amp) of each half-cycle under the
    # silence threshold — small but nonzero
    assert f["silence_ratio"] <= 0.02


def test_extract_audio_features_spark(spark):
    t = np.arange(4000) / 8000.0
    wav = audio.encode_wav(0.25 * np.sin(2 * np.pi * 220 * t), 8000)
    rows = [
        (1, bytearray(wav)),
        (2, bytearray(b"not-audio")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    out = {r["media_id"]: r for r in audio.extract_audio_features(df).collect()}
    assert out[1]["sample_rate"] == 8000
    assert out[1]["audio_duration_ms"] == pytest.approx(500.0)
    assert out[1]["rms"] == pytest.approx(0.25 / np.sqrt(2), rel=1e-2)
    assert out[2]["sample_rate"] is None  # undecodable → NULL features
    assert out[3]["sample_rate"] is None


def test_decode_media_sniffs_wav():
    samples = np.linspace(-0.5, 0.5, 64)
    wav = audio.encode_wav(samples, 16_000)
    out = multimodal.decode_media(wav, "audio", fake=False)
    assert out.shape == (64, 1)
    assert np.allclose(out[:, 0], samples, atol=1.0 / 32768)


# ---------------------------------------------------------------- AVI


def _mk_avi(n_frames=6, w=16, h=16, fps=10.0, seed=5):
    from gfw_data_api_spark.llmops.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    imgs = [
        np.full((h, w), 20 * i + 30, dtype=np.uint8) + rng.integers(0, 5, (h, w), dtype=np.uint8)
        for i in range(n_frames)
    ]
    frames = [encode_jpeg(img, quality=95) for img in imgs]
    return video.encode_avi_mjpeg(frames, fps, w, h), imgs


def test_avi_parse_roundtrip():
    data, imgs = _mk_avi()
    info = video.parse_avi(data)
    assert info["n_frames"] == 6
    assert (info["width"], info["height"]) == (16, 16)
    assert info["fps"] == pytest.approx(10.0, rel=0.01)
    assert info["codec"] == "mjpg"


def test_avi_frame_decode_selected():
    data, imgs = _mk_avi()
    out = video.decode_avi_frames(data, [0, 3, 5])
    assert len(out) == 3
    for frame, img in zip(out, (imgs[0], imgs[3], imgs[5])):
        assert frame.shape[:2] == (16, 16)
        # q95 grayscale JPEG of a near-flat image: mean within a few levels
        assert abs(float(frame.mean()) - float(img.mean())) < 4.0


def test_avi_rejects_bad_signature():
    with pytest.raises(ValueError):
        video.parse_avi(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(IndexError):
        data, _ = _mk_avi(n_frames=2)
        video.decode_avi_frames(data, [5])


def test_decode_media_sniffs_avi():
    data, _ = _mk_avi(n_frames=3)
    out = multimodal.decode_media(data, "video", fake=False)
    assert out.shape[0] == 3  # stacked frames


def test_decode_sampled_frames_spark(spark):
    data, imgs = _mk_avi(n_frames=6)
    rows = [(1, bytearray(data)), (2, bytearray(b"not-a-video")), (3, None)]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    out = video.decode_sampled_frames(df, every_nth=2).collect()
    got = sorted((r["media_id"], r["frame_index"]) for r in out)
    assert got == [(1, 0), (1, 2), (1, 4)]
    by_idx = {r["frame_index"]: r for r in out}
    assert by_idx[0]["frame_width"] == 16 and by_idx[0]["frame_height"] == 16
    assert abs(by_idx[4]["frame_mean_luma"] - float(imgs[4].mean())) < 4.0
    assert by_idx[0]["frame_png"] is None


def test_decode_sampled_frames_emit_png(spark):
    data, imgs = _mk_avi(n_frames=2)
    df = spark.createDataFrame([(1, bytearray(data))], "media_id int, payload binary")
    out = video.decode_sampled_frames(df, every_nth=1, emit_png=True).collect()
    decoded = multimodal.decode_png(bytes(out[0]["frame_png"]))
    assert decoded.shape[:2] == (16, 16)


# ------------------------------------------------------------- resize


def test_bilinear_resize_identity_and_downscale():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(8, 6, 3), dtype=np.uint8)
    same = multimodal.bilinear_resize(img, 6, 8)
    assert (same == img).all()  # identity when dims unchanged
    half = multimodal.bilinear_resize(img, 3, 4)
    assert half.shape == (4, 3, 3)
    # 2x2 box positions: bilinear at pixel centers = 4-pixel average
    expected = img.astype(np.float64).reshape(4, 2, 3, 2, 3).mean(axis=(1, 3))
    assert np.abs(half.astype(np.float64) - expected).max() <= 1.0


def test_resize_images_decode_path(spark):
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(multimodal.encode_png(img)), ("image", "png", 16, 16, None, None)),
        (2, bytearray(b"undecodable"), ("image", "raw", 8, 8, None, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id int, payload binary, media_meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:int,n_frames:int>",
    )
    out = {r["media_id"]: r for r in multimodal.resize_images(df, 8, 8, decode=True).collect()}
    resized = multimodal.decode_png(bytes(out[1]["payload"]))
    assert resized.shape == (8, 8, 3)
    assert out[1]["media_meta"]["width"] == 8 and out[1]["media_meta"]["format"] == "png"
    assert np.abs(
        resized.astype(np.float64)
        - img.astype(np.float64).reshape(8, 2, 8, 2, 3).mean(axis=(1, 3))
    ).max() <= 1.0
    # undecodable row: payload untouched, format preserved, dims rewritten
    assert bytes(out[2]["payload"]) == b"undecodable"
    assert out[2]["media_meta"]["format"] == "raw"
    assert out[2]["media_meta"]["width"] == 8


# ----------------------------------------------------------- phash


def test_dhash_brightness_invariance_and_sensitivity():
    from gfw_data_api_spark.llmops import phash

    rng = np.random.default_rng(2)
    img = rng.integers(30, 200, (12, 16, 3)).astype(np.uint8)
    h0 = phash.dhash64(img)
    assert phash.dhash64(np.clip(img.astype(np.int32) + 20, 0, 255).astype(np.uint8)) == h0
    other = rng.integers(30, 200, (12, 16, 3)).astype(np.uint8)
    ham = bin((h0 ^ phash.dhash64(other)) & ((1 << 64) - 1)).count("1")
    assert ham > 10


def test_phash_resize_robustness():
    from gfw_data_api_spark.llmops import phash
    from gfw_data_api_spark.llmops.multimodal import bilinear_resize

    rng = np.random.default_rng(3)
    # smooth image (random low-res upsampled) so resizing preserves structure
    img = bilinear_resize(rng.integers(0, 256, (6, 6)).astype(np.uint8), 64, 64)
    small = bilinear_resize(img, 24, 24)
    h1, h2 = phash.phash64(img), phash.phash64(small)
    ham = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert ham <= 6  # low-frequency structure survives a 2.7x downscale
    other = bilinear_resize(rng.integers(0, 256, (6, 6)).astype(np.uint8), 64, 64)
    assert bin((h1 ^ phash.phash64(other)) & ((1 << 64) - 1)).count("1") > 12


def test_perceptual_neardup_pairs_planted(spark):
    from gfw_data_api_spark.llmops import phash
    from gfw_data_api_spark.llmops.multimodal import encode_png

    rng = np.random.default_rng(8)
    base_a = rng.integers(30, 200, (8, 9)).astype(np.uint8)
    base_b = rng.integers(30, 200, (8, 9)).astype(np.uint8)
    rows = [
        (1, bytearray(encode_png(base_a))),
        (2, bytearray(encode_png(base_a + 5))),   # brightness twin of 1
        (3, bytearray(encode_png(base_b))),
        (4, bytearray(b"undecodable")),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    hashed = phash.perceptual_hashes(df)
    by_id = {r["media_id"]: r for r in hashed.collect()}
    assert by_id[4]["dhash"] is None and by_id[5]["phash"] is None
    pairs = phash.perceptual_neardup_pairs(hashed).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_perceptual_neardup_pigeonhole_contract(spark):
    from gfw_data_api_spark.llmops import phash

    df = spark.createDataFrame([(1, bytearray(b"x"))], "media_id int, payload binary")
    hashed = phash.perceptual_hashes(df, fake=True)
    with pytest.raises(ValueError):
        phash.perceptual_neardup_pairs(hashed, max_hamming=4, bands=4)


# ------------------------------------------------- property tests


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    n=st.integers(min_value=1, max_value=500),
    channels=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 22050, 44100]),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_wav_16bit_roundtrip_property(n, channels, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1.0, 1.0, size=(n, channels))
    out, r = audio.decode_wav(audio.encode_wav(samples, rate, bits=16))
    assert r == rate and out.shape == (n, channels)
    assert np.abs(out - np.clip(samples, -1, 32767 / 32768)).max() <= 1.0 / 32768


@given(
    n=st.integers(min_value=0, max_value=300),
    rate=st.sampled_from([8000, 48000]),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=40, deadline=None)
def test_wav_float32_roundtrip_property(n, rate, seed):
    rng = np.random.default_rng(seed)
    samples = rng.uniform(-1.0, 1.0, size=n).astype(np.float32).astype(np.float64)
    out, _ = audio.decode_wav(audio.encode_wav(samples, rate, bits=-32))
    # float32 payload is exact for float32-representable inputs
    assert out.shape == (n, 1)
    assert (out[:, 0] == samples).all()


@given(data=st.binary(max_size=200))
@settings(max_examples=120, deadline=None)
def test_wav_decoder_never_crashes_on_garbage(data):
    try:
        audio.decode_wav(data)
    except (ValueError, NotImplementedError):
        pass  # the only allowed outcomes for malformed input


@given(
    n_frames=st.integers(min_value=1, max_value=8),
    w=st.sampled_from([8, 16, 24]),
    h=st.sampled_from([8, 16]),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=25, deadline=None)
def test_avi_container_roundtrip_property(n_frames, w, h, seed):
    from gfw_data_api_spark.llmops.jpeg import encode_jpeg

    rng = np.random.default_rng(seed)
    frames = [
        encode_jpeg(rng.integers(0, 256, (h, w)).astype(np.uint8), quality=90)
        for _ in range(n_frames)
    ]
    data = video.encode_avi_mjpeg(frames, 12.0, w, h)
    info = video.parse_avi(data)
    assert info["n_frames"] == n_frames
    assert (info["width"], info["height"]) == (w, h)
    decoded = video.decode_avi_frames(data)
    assert len(decoded) == n_frames
    assert all(f.shape[:2] == (h, w) for f in decoded)


@given(data=st.binary(max_size=200))
@settings(max_examples=120, deadline=None)
def test_avi_parser_never_crashes_on_garbage(data):
    try:
        video.parse_avi(data)
    except (ValueError, NotImplementedError):
        pass


@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    oh=st.integers(min_value=1, max_value=24),
    ow=st.integers(min_value=1, max_value=24),
    seed=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bilinear_resize_properties(h, w, oh, ow, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    out = multimodal.bilinear_resize(img, ow, oh)
    assert out.shape == (oh, ow, 3)
    # interpolation never exceeds the input value range
    assert out.min() >= img.min() and out.max() <= img.max()
    # same-size resize is the identity
    assert (multimodal.bilinear_resize(img, w, h) == img).all()
    # brightness-shift near-equivariance for integer shifts: half-up
    # rounding makes the shift commute except where the float weight
    # sum lands an interpolated value on a .5 boundary (one level off).
    # Exact equivariance holds for the fixed sizes the m04 gate uses
    # (verified exhaustively there); the general property is ±1.
    shift = int(rng.integers(1, 30))
    shifted = np.clip(img.astype(np.int32) + shift, 0, 255)
    if shifted.max() <= 255 and (shifted - shift == img).all():
        out2 = multimodal.bilinear_resize(shifted.astype(np.uint8), ow, oh)
        assert np.abs(out2.astype(np.int32) - out.astype(np.int32) - shift).max() <= 1


# ---------------------------------------------------------------- GIF


def test_gif_single_frame_roundtrip():
    from gfw_data_api_spark.llmops import gif

    rng = np.random.default_rng(6)
    img = (rng.integers(0, 4, (10, 14))[:, :, None] * np.array([60, 30, 10])).astype(np.uint8)
    frames, delays = gif.decode_gif(gif.encode_gif(img))
    assert len(frames) == 1
    assert (frames[0] == img).all()


def test_gif_animation_roundtrip_and_delays():
    from gfw_data_api_spark.llmops import gif

    rng = np.random.default_rng(7)
    seq = [
        (rng.integers(0, 8, (6, 6))[:, :, None] * np.array([20, 10, 5])).astype(np.uint8)
        for _ in range(4)
    ]
    frames, delays = gif.decode_gif(gif.encode_gif(seq, [50, 100, 150, 200]))
    assert len(frames) == 4
    assert delays == [50, 100, 150, 200]
    for got, want in zip(frames, seq):
        assert (got == want).all()


def test_gif_interlaced_decode():
    """Hand-build an interlaced frame: rows permuted per the GIF pass
    order must come back in screen order."""
    from gfw_data_api_spark.llmops import gif

    img = (np.arange(8)[:, None, None] * np.array([30, 0, 0])).astype(np.uint8)
    img = np.broadcast_to(img, (8, 4, 3)).copy()
    data = bytearray(gif.encode_gif(img))
    # flip the interlace bit in the image descriptor and permute rows:
    # our encoder writes one image descriptor right after the GCE
    desc = data.index(b"\x2c")
    flags = data[desc + 9]
    data[desc + 9] = flags | 0x40
    # re-encode pixel rows in interlace order by rebuilding via encoder
    order = [0, 8, 4, 2, 6, 1, 3, 5, 7]
    order = [r for r in [0, 8, 4, 2, 6, 1, 3, 5, 7] if r < 8]
    # simpler: encode an image whose rows are pre-permuted so that after
    # deinterlacing we get back `img`
    pass_order = (
        list(range(0, 8, 8)) + list(range(4, 8, 8)) + list(range(2, 8, 4)) + list(range(1, 8, 2))
    )
    permuted = img[pass_order]
    data2 = bytearray(gif.encode_gif(permuted))
    desc2 = data2.index(b"\x2c")
    data2[desc2 + 9] |= 0x40
    frames, _ = gif.decode_gif(bytes(data2))
    assert (frames[0] == img).all()


def test_gif_transparency_composites_over_previous():
    from gfw_data_api_spark.llmops import gif

    base = np.full((4, 4, 3), 100, dtype=np.uint8)
    overlay = np.zeros((4, 4, 3), dtype=np.uint8)
    overlay[1:3, 1:3] = 200
    data = bytearray(gif.encode_gif([base, overlay]))
    # mark color index of (0,0,0) as transparent in the SECOND frame's GCE
    # our encoder writes a GCE (21 f9 04 ...) before each frame
    first = data.index(b"\x21\xf9\x04")
    second = data.index(b"\x21\xf9\x04", first + 1)
    # find the overlay's color table: colors sorted → (0,0,0) is index 0
    data[second + 3] |= 0x01  # transparency flag
    data[second + 6] = 0      # transparent index
    frames, _ = gif.decode_gif(bytes(data))
    assert (frames[0] == base).all()
    # transparent zeros show the base; the 200-block overwrites
    assert (frames[1][0, 0] == [100, 100, 100]).all()
    assert (frames[1][1, 1] == [200, 200, 200]).all()


def test_gif_encode_rejects_delay_frame_mismatch():
    from gfw_data_api_spark.llmops import gif

    frames = [np.zeros((4, 4, 3), dtype=np.uint8)] * 3
    with pytest.raises(ValueError, match="2 entries for 3 frames"):
        gif.encode_gif(frames, delays_ms=[100, 100])


def test_gif_rejects_garbage():
    from gfw_data_api_spark.llmops import gif

    with pytest.raises(ValueError):
        gif.decode_gif(b"GIF89a\x00")
    with pytest.raises(ValueError):
        gif.decode_gif(b"NOTGIF")


def test_decode_media_sniffs_gif():
    from gfw_data_api_spark.llmops import gif

    img = np.full((5, 5, 3), 77, dtype=np.uint8)
    out = multimodal.decode_media(gif.encode_gif(img), "image", fake=False)
    assert out.shape == (5, 5, 3) and (out == img).all()


def test_decode_sampled_frames_gif(spark):
    from gfw_data_api_spark.llmops import gif

    seq = [np.full((4, 4, 3), 40 * (i + 1), dtype=np.uint8) for i in range(5)]
    data = gif.encode_gif(seq)
    df = spark.createDataFrame([(1, bytearray(data))], "media_id int, payload binary")
    out = video.decode_sampled_frames(df, every_nth=2).collect()
    got = sorted((r["media_id"], r["frame_index"], r["frame_mean_luma"]) for r in out)
    assert got == [(1, 0, 40.0), (1, 2, 120.0), (1, 4, 200.0)]


# ------------------------------------------------- audio fingerprint


def test_audio_fingerprint_gain_invariance_and_sensitivity():
    rng = np.random.default_rng(12)
    t = np.arange(4000) / 8000.0
    sig = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 1320 * t)
    sig += 0.03 * rng.standard_normal(len(t))
    f1 = audio.audio_fingerprint64(sig, 8000)
    assert audio.audio_fingerprint64(0.35 * sig, 8000) == f1  # volume change
    other = 0.4 * np.sin(2 * np.pi * 700 * t) + 0.03 * rng.standard_normal(len(t))
    ham = bin((f1 ^ audio.audio_fingerprint64(other, 8000)) & ((1 << 64) - 1)).count("1")
    assert ham > 10


def test_audio_fingerprints_spark_pairs(spark):
    from gfw_data_api_spark.llmops.phash import perceptual_neardup_pairs

    rng = np.random.default_rng(13)
    t = np.arange(4096) / 8000.0

    def wav(freq, gain):
        sig = 0.5 * np.sin(2 * np.pi * freq * t) + 0.04 * rng.standard_normal(len(t))
        return bytearray(audio.encode_wav(gain * sig / np.max(np.abs(sig)), 8000, bits=-32))

    sig_a = 0.5 * np.sin(2 * np.pi * 500 * t) + 0.04 * np.random.default_rng(1).standard_normal(len(t))
    base = sig_a / np.max(np.abs(sig_a))
    rows = [
        (1, bytearray(audio.encode_wav(0.6 * base, 8000, bits=-32))),
        (2, bytearray(audio.encode_wav(0.3 * base, 8000, bits=-32))),  # volume twin
        (3, wav(1800, 0.5)),
        (4, bytearray(b"not-audio")),
    ]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    fps = audio.audio_fingerprints(df)
    by_id = {r["media_id"]: r["afp"] for r in fps.collect()}
    assert by_id[4] is None
    pairs = perceptual_neardup_pairs(fps, "afp").collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in pairs] == [(1, 2, 0)]


def test_video_content_keys_remux_invariant(spark):
    from gfw_data_api_spark.llmops import gif
    from gfw_data_api_spark.llmops.jpeg import encode_jpeg

    rng = np.random.default_rng(21)
    frames = [encode_jpeg(rng.integers(0, 256, (8, 8)).astype(np.uint8)) for _ in range(2)]
    rows = [
        (1, bytearray(video.encode_avi_mjpeg(frames, 5.0, 8, 8))),
        (2, bytearray(video.encode_avi_mjpeg(frames, 24.0, 8, 8))),   # remuxed fps
        (3, bytearray(video.encode_avi_mjpeg(list(reversed(frames)), 5.0, 8, 8))),
        (4, bytearray(b"not-a-video")),
    ]
    # byte-level payloads all differ
    assert len({bytes(r[1]) for r in rows}) == 4
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    keys = {r["media_id"]: r["video_key"] for r in video.video_content_keys(df).collect()}
    assert keys[1] == keys[2]          # container change: same content
    assert keys[1] != keys[3]          # frame order change: different content
    assert keys[4] is None


def test_video_content_keys_gif(spark):
    from gfw_data_api_spark.llmops import gif

    seq = [np.full((4, 4, 3), 30 * (i + 1), dtype=np.uint8) for i in range(3)]
    rows = [
        (1, bytearray(gif.encode_gif(seq, [50, 50, 50]))),
        (2, bytearray(gif.encode_gif(seq, [200, 200, 200]))),  # delays differ
    ]
    assert bytes(rows[0][1]) != bytes(rows[1][1])
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    keys = {r["media_id"]: r["video_key"] for r in video.video_content_keys(df).collect()}
    assert keys[1] == keys[2]


def test_media_stream_dedup_stream_equals_batch(spark, tmp_path):
    """The st08 composition on a REAL stream: WAV payloads land as
    files, are fingerprinted mid-stream, and deduplicate on the
    perceptual key with bounded state — the surviving key set equals
    the deterministic batch twin's."""
    import datetime

    from gfw_data_api_spark.llmops.phash import perceptual_neardup_pairs  # noqa: F401
    from gfw_data_api_spark.streaming.dedup import dedup_events

    rng = np.random.default_rng(31)
    t = np.arange(4096) / 8000.0
    t0 = datetime.datetime(2024, 1, 1, 9)

    def group_wav(g, gain):
        grng = np.random.default_rng(g * 7919 + 3)
        freqs = grng.uniform(100, 3500, 3)
        amps = grng.uniform(0.2, 0.5, 3)
        sig = sum(a * np.sin(2 * np.pi * f * t) for a, f in zip(amps, freqs))
        sig += 0.05 * grng.standard_normal(len(t))
        sig = sig / np.max(np.abs(sig)) * 0.6
        return bytearray(audio.encode_wav(gain * sig, 8000, bits=-32))

    rows = [
        (g * 10 + k, t0 + datetime.timedelta(minutes=g * 10 + k), group_wav(g, 0.4 + 0.1 * k))
        for g in range(4)
        for k in range(3)  # 3 gain-variants per group, all bytes distinct
    ]
    df = spark.createDataFrame(rows, "media_id long, ts timestamp, payload binary")
    src = str(tmp_path / "src")
    df.write.parquet(src)

    batch = dedup_events(
        audio.audio_fingerprints(spark.read.parquet(src)), ["afp"], ts_col="ts",
        tiebreak_col="media_id",
    )
    batch_keys = {r["afp"] for r in batch.collect()}
    assert len(batch_keys) == 4  # one survivor per waveform group

    stream = spark.readStream.schema(df.schema).parquet(src)
    out = dedup_events(
        audio.audio_fingerprints(stream), ["afp"], ts_col="ts", watermark="2 hours"
    )
    assert out.isStreaming
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.read.parquet(sink)
    assert {r["afp"] for r in streamed.collect()} == batch_keys
    assert streamed.count() == 4


def test_mel_filterbank_shape_and_coverage():
    fb = audio.mel_filterbank(16, 257, 8000)
    assert fb.shape == (16, 257)
    assert (fb >= 0).all() and fb.max() <= 1.0
    # every filter has support; filters tile the spectrum
    assert (fb.sum(axis=1) > 0).all()


def test_mel_log_energies_distinguish_bands():
    t = np.arange(8192) / 8000.0
    low = np.sin(2 * np.pi * 200 * t)
    high = np.sin(2 * np.pi * 3000 * t)
    g_low = audio.mel_log_energies(low, 8000)
    g_high = audio.mel_log_energies(high, 8000)
    assert g_low.shape == (8, 16)
    # energy concentrates in different mel bands
    assert g_low.mean(axis=0).argmax() < g_high.mean(axis=0).argmax()


def test_extract_mel_features_spark(spark):
    t = np.arange(4096) / 8000.0
    wav = audio.encode_wav(0.4 * np.sin(2 * np.pi * 500 * t), 8000)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(b"junk"))], "media_id int, payload binary"
    )
    out = {r["media_id"]: r["mel"] for r in audio.extract_mel_features(df).collect()}
    assert len(out[1]) == 8 * 16
    assert out[2] is None


def test_m09_band_map_matches_filterbank():
    """The m09 gate's pinned bin→band / bin→weight tables must equal
    what mel_filterbank actually computes for the gate's fixed config
    (sr=8000, frame_len=256 → 129 bins, 16 mels) — and every pinned
    weight string must evaluate to the EXACT float the filterbank's own
    small-integer division produces."""
    import numpy as np

    from gfw_data_api_spark.inventory import _M09_BANDS, _M09_WEIGHTS
    from gfw_data_api_spark.llmops.audio import mel_filterbank

    fb = mel_filterbank(16, 129, 8000)
    for i, k in enumerate(range(4, 28)):
        band = int(np.argmax(fb[:, k]))
        assert band == _M09_BANDS[i], (k, band, _M09_BANDS[i])
        assert eval(_M09_WEIGHTS[i]) == fb[band, k], (k, _M09_WEIGHTS[i], fb[band, k])
