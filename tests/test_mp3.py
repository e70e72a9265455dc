"""MP3 frame-layer tests (llmops/mp3.py, gate m10).

The builder/parser pair is cross-checked three ways: round-trip here,
hand-computed frame arithmetic here, and independently-recomputed
lengths in the m10 gate's DuckDB oracle.
"""

import pytest

from gfw_data_api_spark.llmops.mp3 import (
    build_mp3,
    decode_mp3,
    frame_length,
    mp3_stream_info,
    parse_mp3,
)


def test_frame_length_formula():
    # 144 * 128000 / 44100 = 417.9… → 417, +1 padding
    assert frame_length(128, 44100, 0) == 417
    assert frame_length(128, 44100, 1) == 418
    assert frame_length(320, 32000, 0) == 1440
    assert frame_length(32, 48000, 0) == 96


def test_cbr_roundtrip_exact_accounting():
    data = build_mp3([128] * 5, sample_rate=44100, mono=False)
    info = parse_mp3(data)
    assert info["n_frames"] == 5
    assert info["total_samples"] == 5 * 1152
    assert info["duration_us"] == 5 * 1152 * 1_000_000 // 44100
    assert info["sample_rate"] == 44100
    assert info["channel_mode"] == "stereo"
    assert info["is_vbr"] is False
    assert info["sum_kbps"] == 640
    assert info["audio_bytes"] == 5 * 417 == len(data)
    assert info["xing_frames"] is None


def test_vbr_with_xing_padding_and_tags():
    kbps = [64, 128, 192, 256]
    pads = [1, 0, 1, 0]
    data = build_mp3(
        kbps, sample_rate=48000, mono=True, pad_mask=pads,
        xing_count=4, id3v2_bytes=33, id3v1=True,
    )
    info = parse_mp3(data)
    assert info["n_frames"] == 4
    assert info["is_vbr"] is True
    assert info["sum_kbps"] == sum(kbps)
    assert info["channel_mode"] == "mono"
    assert info["xing_frames"] == 4
    expected_audio = sum(frame_length(k, 48000, p) for k, p in zip(kbps, pads))
    assert info["audio_bytes"] == expected_audio
    # ID3v2 (10 + 33) + audio + ID3v1 (128)
    assert len(data) == 43 + expected_audio + 128


def test_crc_frames_parse():
    data = build_mp3([192, 192], sample_rate=32000, with_crc=True)
    info = parse_mp3(data)
    assert info["n_frames"] == 2 and info["is_vbr"] is False


def test_truncated_frame_raises():
    data = build_mp3([128] * 3)
    with pytest.raises(ValueError, match="truncated MP3"):
        parse_mp3(data[:-10])


def test_lost_sync_raises():
    data = bytearray(build_mp3([128] * 2))
    data[0] = 0x00
    with pytest.raises(ValueError, match="frame sync"):
        parse_mp3(bytes(data))


def test_out_of_subset_profiles_reject_loudly():
    hdr = bytearray(build_mp3([128]))
    reserved_v = bytearray(hdr)
    reserved_v[1] = (reserved_v[1] & ~0x18) | 0x08  # version bits 01
    with pytest.raises(ValueError, match="reserved MPEG version"):
        parse_mp3(bytes(reserved_v))
    reserved_l = bytearray(hdr)
    reserved_l[1] = reserved_l[1] & ~0x06  # layer bits 00
    with pytest.raises(ValueError, match="reserved MPEG layer"):
        parse_mp3(bytes(reserved_l))
    # free format TRANSLATES since round 8 — but a single-frame free
    # stream has no second sync to derive the length from, and a bare
    # header parse without stream context still refuses
    free = bytearray(hdr)
    free[2] = free[2] & 0x0F  # bitrate index 0 = free format
    with pytest.raises(ValueError, match="no second matching sync"):
        parse_mp3(bytes(free))
    from gfw_data_api_spark.llmops.mp3 import parse_frame_header

    with pytest.raises(NotImplementedError, match="free-format"):
        parse_frame_header(bytes(free), 0)


def test_full_version_layer_matrix_round_trips():
    """Round 7: MPEG-1/2/2.5 × Layers I/II/III all walk (VERDICT r6
    #7). Frame-length arithmetic per profile: Layer I counts 4-byte
    slots; MPEG-2/2.5 Layer III halves samples-per-frame to 576."""
    cases = [
        # (version, layer, rate, kbps list, expected spf)
        ("1", 1, 44100, [128, 256, 128], 384),
        ("1", 2, 48000, [64, 192], 1152),
        ("2", 3, 22050, [32, 64, 32, 64], 576),
        ("2.5", 3, 8000, [16, 40], 576),
        ("2", 2, 24000, [48, 96, 48], 1152),
        ("2", 1, 22050, [32, 144], 384),
    ]
    for version, layer, rate, kbps, spf in cases:
        data = build_mp3(
            kbps, sample_rate=rate, version=version, layer=layer, mono=True
        )
        info = parse_mp3(data)
        assert info["mpeg_version"] == version
        assert info["layer"] == layer
        assert info["n_frames"] == len(kbps)
        assert info["total_samples"] == len(kbps) * spf
        assert info["sample_rate"] == rate
        assert info["sum_kbps"] == sum(kbps)
        assert info["is_vbr"] == (len(set(kbps)) > 1)
        assert info["audio_bytes"] == len(data)
        # independent arithmetic: recompute the byte accounting
        if layer == 1:
            expect = sum((12_000 * k // rate) * 4 for k in kbps)
        else:
            expect = sum((spf // 8) * 1000 * k // rate for k in kbps)
        assert info["audio_bytes"] == expect


def test_mpeg2_layer3_xing_offset_uses_short_side_info():
    data = build_mp3(
        [64, 64], sample_rate=22050, version="2", layer=3, mono=True,
        xing_count=2,
    )
    info = parse_mp3(data)
    assert info["xing_frames"] == 2  # found at 4 + 9 (MPEG-2 mono side info)


def test_midstream_parameter_change_raises():
    a = build_mp3([128], sample_rate=44100)
    b = build_mp3([128], sample_rate=48000)
    with pytest.raises(ValueError, match="sample-rate change"):
        parse_mp3(a + b)


def test_decode_seam_names_the_reason():
    with pytest.raises(NotImplementedError, match="Huffman"):
        decode_mp3(build_mp3([128]))


def test_mp3_stream_info_plumbing(spark):
    rows = [
        (1, bytearray(build_mp3([128] * 3, sample_rate=44100))),
        (2, bytearray(build_mp3([64, 256], sample_rate=32000, mono=True, xing_count=2))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in mp3_stream_info(df).collect()}
    assert got[1].n_frames == 3 and got[1].is_vbr is False
    assert got[1].xing_frames is None
    assert got[2].n_frames == 2 and got[2].is_vbr is True
    assert got[2].channel_mode == "mono" and got[2].xing_frames == 2
    assert got[2].duration_us == 2 * 1152 * 1_000_000 // 32000


class TestFreeFormat:
    """Round-8 free-format bitrate (VERDICT r7 #9): the header signals
    no length, so the walker derives the constant frame size from the
    first next-sync scan — the standard decoder recipe."""

    def test_round_trip_with_padding(self):
        pads = [0, 1, 0, 0, 1, 1, 0]
        blob = build_mp3(
            [0] * 7, pad_mask=pads, free_frame_len=300,
            id3v2_bytes=40, id3v1=True,
        )
        info = parse_mp3(blob)
        assert info["free_frame_bytes"] == 300
        assert info["n_frames"] == 7
        assert info["audio_bytes"] == 300 * 7 + sum(pads)
        assert info["sum_kbps"] == 0 and info["is_vbr"] is False

    def test_layer1_four_byte_slots(self):
        blob = build_mp3(
            [0] * 5, pad_mask=[1, 0, 1, 0, 0], free_frame_len=480,
            layer=1, sample_rate=32000,
        )
        info = parse_mp3(blob)
        assert info["free_frame_bytes"] == 480
        assert info["audio_bytes"] == 480 * 5 + 2 * 4

    def test_mpeg2_mono_crc(self):
        blob = build_mp3(
            [0] * 4, free_frame_len=120, version="2",
            sample_rate=22050, mono=True, with_crc=True,
        )
        info = parse_mp3(blob)
        assert info["free_frame_bytes"] == 120
        assert info["channel_mode"] == "mono"
        assert info["total_samples"] == 4 * 576

    def test_tabled_stream_reports_none(self):
        assert parse_mp3(build_mp3([128, 128]))["free_frame_bytes"] is None

    def test_mixed_free_and_tabled_rejects(self):
        blob = build_mp3([0] * 2, free_frame_len=200) + build_mp3([128])
        with pytest.raises(ValueError, match="tabled bitrate inside"):
            parse_mp3(blob)
