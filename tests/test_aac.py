"""AAC ADTS frame-layer tests (llmops/aac.py, gate m11).

The builder/parser pair is cross-checked three ways: round-trip here,
hand-computed header arithmetic here, and independently-recomputed
lengths in the m11 gate's DuckDB oracle.
"""

import pytest

from gfw_data_api_spark.llmops.aac import (
    adts_stream_info,
    build_adts,
    decode_aac,
    parse_adts,
    parse_adts_header,
)


def test_cbr_roundtrip_exact_accounting():
    data = build_adts([100, 120, 90], sample_rate=48000, channels=2)
    info = parse_adts(data)
    assert info["n_frames"] == 3
    assert info["n_blocks"] == 3
    assert info["total_samples"] == 3 * 1024
    assert info["duration_us"] == 3 * 1024 * 1_000_000 // 48000
    assert info["sample_rate"] == 48000
    assert info["channel_config"] == 2
    assert info["profile"] == "lc"
    assert info["is_vbr"] is False
    assert info["audio_bytes"] == 3 * 7 + 100 + 120 + 90 == len(data)


def test_vbr_crc_multiblock_and_id3():
    data = build_adts(
        [64, 64],
        sample_rate=22050,
        channels=1,
        with_crc=True,
        vbr=True,
        blocks_per_frame=[2, 4],
        id3v2_bytes=25,
    )
    info = parse_adts(data)
    assert info["n_frames"] == 2
    assert info["n_blocks"] == 6
    assert info["total_samples"] == 6 * 1024
    assert info["duration_us"] == 6 * 1024 * 1_000_000 // 22050
    assert info["is_vbr"] is True
    # per frame: 7 header + 2 crc + 64 payload; ID3 tag excluded
    assert info["audio_bytes"] == 2 * (7 + 2 + 64)
    assert len(data) == 10 + 25 + info["audio_bytes"]


def test_13bit_length_packing_straddles_bytes():
    # payload chosen so the frame length crosses both byte boundaries
    # of the split 2+8+3 bit field
    nbytes = 0x1FFF - 7  # max length
    data = build_adts([nbytes], sample_rate=96000, channels=7)
    hdr = parse_adts_header(data, 0)
    assert hdr["length"] == 0x1FFF
    assert hdr["channels"] == 7
    assert hdr["sample_rate"] == 96000
    with pytest.raises(ValueError, match="13-bit"):
        build_adts([0x1FFF - 6])


def test_mpeg2_id_bit_accepted():
    data = build_adts([50], sample_rate=44100, channels=2, mpeg2=True)
    info = parse_adts(data)
    assert info["n_frames"] == 1 and info["sample_rate"] == 44100


def test_truncated_frame_raises():
    data = build_adts([80, 80])
    with pytest.raises(ValueError, match="truncated ADTS"):
        parse_adts(data[:-5])


def test_lost_sync_and_bad_layer_raise():
    data = bytearray(build_adts([40]))
    bad = bytearray(data)
    bad[0] = 0x00
    with pytest.raises(ValueError, match="frame sync"):
        parse_adts(bytes(bad))
    layer = bytearray(data)
    layer[1] |= 0x02  # layer bits 01
    with pytest.raises(ValueError, match="layer"):
        parse_adts(bytes(layer))


def test_out_of_subset_rejects_loudly():
    data = bytearray(build_adts([40]))
    main = bytearray(data)
    main[2] = main[2] & 0x3F  # profile bits 00 = Main
    with pytest.raises(NotImplementedError, match="main"):
        parse_adts(bytes(main))
    pce = bytearray(data)
    pce[2] &= 0xFE  # clear channel bit 2
    pce[3] &= 0x3F  # clear channel bits 0..1 → config 0
    with pytest.raises(NotImplementedError, match="PCE"):
        parse_adts(bytes(pce))
    badrate = bytearray(data)
    badrate[2] = (badrate[2] & 0xC3) | (15 << 2)  # freq index 15
    with pytest.raises(ValueError, match="frequency index"):
        parse_adts(bytes(badrate))


def test_midstream_parameter_change_raises():
    a = build_adts([50], sample_rate=44100)
    b = build_adts([50], sample_rate=48000)
    with pytest.raises(ValueError, match="sample-rate change"):
        parse_adts(a + b)
    c = build_adts([50], sample_rate=44100, channels=1)
    with pytest.raises(ValueError, match="channel-config change"):
        parse_adts(a + c)


def test_decode_seam_names_the_reason():
    with pytest.raises(NotImplementedError, match="Huffman"):
        decode_aac(build_adts([40]))


def test_adts_stream_info_plumbing(spark):
    rows = [
        (1, bytearray(build_adts([100, 100], sample_rate=48000, channels=2))),
        (2, bytearray(build_adts([80], sample_rate=16000, channels=1, vbr=True,
                                 blocks_per_frame=[3]))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in adts_stream_info(df).collect()}
    assert got[1].n_frames == 2 and got[1].is_vbr is False
    assert got[1].total_samples == 2 * 1024
    assert got[2].n_blocks == 3 and got[2].is_vbr is True
    assert got[2].channel_config == 1
    assert got[2].duration_us == 3 * 1024 * 1_000_000 // 16000
