"""Regression tests for the round-1 security/correctness review findings
(guard bypasses, FROM-binding bypasses, injection, alias handling)."""

import pandas as pd
import pytest

from gfw_data_api_spark.functions import geometry as geo
from gfw_data_api_spark.operators.query import execute_on_dataframe
from gfw_data_api_spark.sql import QueryGuardError, scrutinize_sql
from gfw_data_api_spark.sql.guard import bind_from, validate_sql


def test_spark_reflection_builtins_blocked():
    for sql in (
        "SELECT reflect('java.lang.System','getenv','PATH') FROM data",
        "SELECT java_method('java.lang.System','exit',1) FROM data",
    ):
        with pytest.raises(QueryGuardError) as exc:
            validate_sql(sql)
        assert exc.value.detail == "Use of admin, system or private functions is not allowed."


def test_quoted_forbidden_function_blocked():
    with pytest.raises(QueryGuardError):
        validate_sql('SELECT "pg_read_file"(\'/etc/passwd\') FROM t')
    with pytest.raises(QueryGuardError):
        validate_sql('SELECT "reflect"(a, b) FROM t')


def test_bind_from_ignores_from_in_string_literal():
    validated = validate_sql("SELECT 'from x where', col FROM data WHERE col > 1")
    bound = bind_from(validated, "the_view")
    assert bound == "SELECT 'from x where', col FROM the_view WHERE col > 1"


def test_bind_from_ignores_scalar_subquery_from():
    validated = validate_sql("SELECT (SELECT max(v) FROM other) AS m FROM data")
    bound = bind_from(validated, "the_view")
    assert bound == "SELECT (SELECT max(v) FROM other) AS m FROM the_view"


def test_bind_from_preserves_quoted_alias(spark):
    # the quoted alias is re-emitted backtick-quoted (Spark identifier
    # syntax) so the view binds instead of silently keeping the old table
    validated = validate_sql('SELECT x FROM data AS "a b" WHERE x = 1')
    bound = bind_from(validated, "the_view")
    assert bound == "SELECT x FROM the_view AS `a b` WHERE x = 1"
    # and a quoted alias that needs no quoting still executes end to end
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rows = execute_on_dataframe(
        spark, df, 'SELECT t.x FROM data AS "t" WHERE t.x = 1'
    ).collect()
    assert [r["x"] for r in rows] == [1]


def test_geometry_injection_neutralized():
    import json

    from gfw_data_api_spark.sql.tokenizer import tokenize

    hostile = {"type": "Polygon') OR 1=1 --", "coordinates": []}
    out = scrutinize_sql("ds", "v1", hostile, "SELECT x FROM data")
    # the whole payload must sit inside ONE balanced string literal —
    # tokenizing the output yields exactly one STRING token whose value
    # is the full canonical GeoJSON (nothing escaped into SQL position)
    strings = [t.value for t in tokenize(out) if t.kind == "STRING"]
    assert strings == [json.dumps(hostile)]


def test_leading_semicolon_trimmed(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rows = execute_on_dataframe(spark, df, "; SELECT count(*) AS c FROM data").collect()
    assert rows[0]["c"] == 2


def test_execute_with_literal_containing_from(spark):
    df = spark.createDataFrame([(1,), (2,)], "x int")
    rows = execute_on_dataframe(
        spark, df, "SELECT 'from secret_table where' AS s, count(*) AS c FROM data"
    ).collect()
    assert rows[0]["c"] == 2 and rows[0]["s"] == "from secret_table where"


def test_zonal_alias_preserved(spark, tmp_path):
    import numpy as np

    from gfw_data_api_spark.catalog import Registry
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.ingest import ingest_raster_tiles
    from gfw_data_api_spark.raster.zonal import query_raster

    registry = Registry(str(tmp_path / "cat"))
    grid = Grid(1.0, 20)
    ingest_raster_tiles(
        registry, spark, "layer", "v1", grid, "year",
        {"01N_010E": np.ones((20, 20)) * 2000},
    )
    aoi = {
        "type": "Polygon",
        "coordinates": [[[10.1, 0.1], [10.9, 0.1], [10.9, 0.9], [10.1, 0.9], [10.1, 0.1]]],
    }
    rows = query_raster(
        spark, registry, "layer", "v1",
        "SELECT t.layer__year AS y, count(*) AS n FROM data t GROUP BY t.layer__year",
        aoi,
    ).collect()
    assert rows[0]["y"] == 2000.0 and rows[0]["n"] > 0


def test_unspaced_subtraction_still_references_layer(spark, tmp_path):
    import numpy as np

    from gfw_data_api_spark.catalog import Registry
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.ingest import ingest_raster_tiles
    from gfw_data_api_spark.raster.zonal import query_raster

    registry = Registry(str(tmp_path / "cat2"))
    grid = Grid(1.0, 20)
    ingest_raster_tiles(
        registry, spark, "tcl", "v1", grid, "year",
        {"01N_010E": np.ones((20, 20)) * 2010},
    )
    aoi = {
        "type": "Polygon",
        "coordinates": [[[10.1, 0.1], [10.9, 0.1], [10.9, 0.9], [10.1, 0.9], [10.1, 0.1]]],
    }
    rows = query_raster(
        spark, registry, "tcl", "v1",
        "SELECT sum(tcl__year-2000) AS s FROM data", aoi,  # no spaces around '-'
    ).collect()
    assert rows[0]["s"] > 0


# ---- round-4 code-review findings ----------------------------------


def test_resize_passes_through_animated_gif(spark):
    """An animated GIF in an image table must pass through resize
    unchanged, not crash the batch (review: bilinear_resize outside the
    decode try/except)."""
    import numpy as np

    from gfw_data_api_spark.llmops import gif, multimodal

    seq = [np.full((4, 4, 3), 50 * (i + 1), dtype=np.uint8) for i in range(2)]
    payload = gif.encode_gif(seq)
    rows = [(1, bytearray(payload), ("image", "gif", 4, 4, None, None))]
    df = spark.createDataFrame(
        rows,
        "media_id int, payload binary, media_meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:int,n_frames:int>",
    )
    out = multimodal.resize_images(df, 8, 8, decode=True).collect()[0]
    assert bytes(out["payload"]) == payload          # untouched
    assert out["media_meta"]["format"] == "gif"      # format preserved


def test_persist_slots_evict_dead_threads(spark):
    import threading

    from gfw_data_api_spark.llmops import dedup

    df = spark.createDataFrame([(1,)], "x int")

    def worker():
        dedup._persist_replacing(df.select("x"), "leak_probe")

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    dead_ident = t.ident
    assert (dead_ident, "leak_probe") in dedup._PERSIST_SLOTS
    # any later call from a live thread sweeps the dead thread's slots
    dedup._persist_replacing(df.select("x"), "sweeper")
    assert all(k[0] != dead_ident for k in dedup._PERSIST_SLOTS)


def test_points_within_radius_antimeridian(spark):
    from gfw_data_api_spark.operators.features import points_within_radius

    rows = [(1, 0.0, -179.95), (2, 0.0, 179.5), (3, 0.0, 178.0)]
    df = spark.createDataFrame(rows, "id int, lat double, lon double")
    got = {r["id"] for r in points_within_radius(df, lat=0.0, lng=179.99, radius_km=100.0).collect()}
    assert got == {1, 2}  # the wrapped point is ~6.7 km away
    # eastward wrap too
    got = {r["id"] for r in points_within_radius(df, lat=0.0, lng=-179.99, radius_km=100.0).collect()}
    assert got == {1, 2}


def test_gif_disposal_3_rejected():
    import numpy as np
    import pytest as _pytest

    from gfw_data_api_spark.llmops import gif

    data = bytearray(gif.encode_gif([np.zeros((2, 2, 3), dtype=np.uint8)] * 2))
    gce = data.index(b"\x21\xf9\x04")
    data[gce + 3] |= 3 << 2  # disposal=3 in the first GCE
    with _pytest.raises(NotImplementedError):
        gif.decode_gif(bytes(data))


def test_perceptual_hashes_animated_gif_uses_first_frame(spark):
    import numpy as np

    from gfw_data_api_spark.llmops import gif, phash

    rng = np.random.default_rng(3)
    f0 = rng.integers(30, 200, (8, 9, 3)).astype(np.uint8)
    f1 = rng.integers(30, 200, (8, 9, 3)).astype(np.uint8)
    rows = [
        (1, bytearray(gif.encode_gif([f0, f1]))),  # animated
        (2, bytearray(gif.encode_gif(f0))),        # still of frame 0
    ]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    by_id = {r["media_id"]: r for r in phash.perceptual_hashes(df).collect()}
    assert by_id[1]["dhash"] is not None
    assert by_id[1]["dhash"] == by_id[2]["dhash"]  # first frame hashed


def test_jpeg_rejects_non_divisor_sampling():
    import numpy as np
    import pytest as _pytest

    from gfw_data_api_spark.llmops.jpeg import decode_jpeg, encode_jpeg

    img = np.full((16, 16, 3), 120, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    sof = data.index(b"\xff\xc0")
    # component spec starts at sof+10 (marker 2 + len 2 + prec 1 + h 2 +
    # w 2 + ncomp 1); each spec is (id, hv, tq)
    data[sof + 10 + 1] = 0x31  # comp0 h=3,v=1
    data[sof + 13 + 1] = 0x21  # comp1 h=2 → 3 % 2 != 0
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def test_tile_route_rejects_double_dash(spark, tmp_path_factory):
    from gfw_data_api_spark.api import create_app
    from gfw_data_api_spark.catalog import Registry
    from gfw_data_api_spark.catalog.geostore import Geostore
    from tests.test_api import call

    registry = Registry(str(tmp_path_factory.mktemp("tiles") / "cat"))
    app = create_app(spark, registry, Geostore(registry))
    out = call(app, "GET", "/dataset/d/v1/tile/--1/0/0.png")
    assert out["status"] == 422


# ---- round-4 second-pass (high-effort) review findings -------------


def test_points_within_radius_polar_circle(spark):
    """A circle enclosing a pole covers all longitudes long before the
    planar window reaches 360° — lon pruning must be disabled."""
    from gfw_data_api_spark.operators.features import points_within_radius

    rows = [(1, 89.0, 180.0), (2, 89.5, -90.0), (3, 80.0, 180.0)]
    df = spark.createDataFrame(rows, "id int, lat double, lon double")
    got = {r["id"] for r in points_within_radius(df, lat=89.0, lng=0.0, radius_km=300.0).collect()}
    assert got == {1, 2}  # (89,180) is ~222 km away over the pole


def test_jpeg_skips_fill_bytes():
    """0xFF fill bytes before a marker are legal padding (T.81 B.1.1.2)."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import decode_jpeg, encode_jpeg

    img = np.full((8, 8), 130, dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=95))
    sof = data.index(b"\xff\xc0")
    padded = bytes(data[:sof]) + b"\xff\xff\xff" + bytes(data[sof:])
    out = decode_jpeg(padded)
    assert out.shape[:2] == (8, 8)
    assert abs(float(out.mean()) - 130.0) < 3.0


def test_jpeg_grayscale_nonunit_sampling_decodes_correctly():
    """A single-component scan is non-interleaved per T.81 A.2.2: the
    declared sampling factors must be ignored, not used to build MCUs."""
    import numpy as np

    from gfw_data_api_spark.llmops.jpeg import decode_jpeg, encode_jpeg

    img = np.tile(np.arange(16, dtype=np.uint8)[:, None] * 12, (1, 16))
    data = bytearray(encode_jpeg(img, quality=95))
    sof = data.index(b"\xff\xc0")
    data[sof + 10 + 1] = 0x22  # declare h=v=2 on the only component
    out = decode_jpeg(bytes(data))
    ref = decode_jpeg(bytes(bytearray(encode_jpeg(img, quality=95))))
    assert out.shape == ref.shape
    assert (out == ref).all()  # sampling factors ignored → same pixels


def test_gif_gce_applies_to_one_frame_only():
    """Frames without their own GCE get spec defaults (disposal 0,
    delay 0), not the previous frame's sticky values."""
    import numpy as np

    from gfw_data_api_spark.llmops import gif

    f0 = np.full((3, 3, 3), 10, dtype=np.uint8)
    f1 = np.full((3, 3, 3), 200, dtype=np.uint8)
    data = bytearray(gif.encode_gif([f0, f1], [70, 70]))
    # strip the SECOND frame's GCE entirely (21 f9 04 + 4 body + 00 = 8 bytes)
    first = data.index(b"\x21\xf9\x04")
    second = data.index(b"\x21\xf9\x04", first + 1)
    del data[second : second + 8]
    # give the FIRST frame disposal=2 (restore to background)
    data[first + 3] |= 2 << 2
    frames, delays = gif.decode_gif(bytes(data))
    assert delays == [70, 0]  # no GCE → delay defaults to 0
    # frame 2 drew over a restored canvas and fully covers it
    assert (frames[1] == 200).all()


def test_decode_media_rejects_empty_avi():
    from gfw_data_api_spark.llmops import multimodal, video

    empty = video.encode_avi_mjpeg([], 10.0, 8, 8)
    with pytest.raises(ValueError):
        multimodal.decode_media(empty, "video", fake=False)


def test_resize_keeps_meta_for_passthrough_rows(spark):
    """Rows that pass through un-resized must keep metadata that still
    describes their bytes (no unconditional dim rewrite)."""
    import numpy as np

    from gfw_data_api_spark.llmops import gif, multimodal

    seq = [np.full((4, 4, 3), 60 * (i + 1), dtype=np.uint8) for i in range(2)]
    rows = [
        (1, bytearray(gif.encode_gif(seq)), ("image", "gif", 4, 4, None, None)),
        (2, bytearray(b"junk"), ("image", "raw", 9, 9, None, None)),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id int, payload binary, media_meta struct<media_type:string,format:string,"
        "width:int,height:int,duration_ms:int,n_frames:int>",
    )
    out = {r["media_id"]: r["media_meta"] for r in multimodal.resize_images(df, 64, 64, decode=True).collect()}
    assert out[1]["width"] == 4 and out[1]["format"] == "gif"   # animated passthrough
    assert out[2]["width"] == 9 and out[2]["format"] == "raw"   # undecodable passthrough


def test_codec_skip_handlers_survive_truncated_payloads(spark):
    """One malformed payload must NULL its row, never kill the batch
    (IndexError/KeyError/zlib.error now count as decode failures)."""
    from gfw_data_api_spark.llmops import audio, phash, video

    rows = [
        (1, bytearray(b"\xff\xd8\xff")),                      # truncated JPEG → IndexError
        (2, bytearray(b"GIF89a" + b"\x00" * 7 + b"\x21")),    # truncated GIF ext → IndexError
        (3, bytearray(b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 8)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id int, payload binary")
    hashed = {r["media_id"]: r["dhash"] for r in phash.perceptual_hashes(df).collect()}
    assert all(v is None for v in hashed.values())
    keys = {r["media_id"]: r["video_key"] for r in video.video_content_keys(df).collect()}
    assert all(v is None for v in keys.values())
    feats = {r["media_id"]: r["sample_rate"] for r in audio.extract_audio_features(df).collect()}
    assert all(v is None for v in feats.values())
