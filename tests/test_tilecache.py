"""MVT tile cache (operators/tilecache.py): encode/decode round-trip,
tile math, clipping, density cap, Spark job output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.functions import geometry as geo
from gfw_data_api_spark.operators.tilecache import (
    EXTENT,
    build_tile_cache,
    decode_tile,
    encode_tile,
    write_tile_cache,
)


def test_encode_decode_point_z0():
    # lon 0, lat 0 is the exact center of tile 0/0/0
    g = {"type": "Point", "coordinates": [0.0, 0.0]}
    blob = encode_tile([(g, {"name": "origin", "rank": 3})], 0, 0, 0, "test")
    tile = decode_tile(blob)
    assert tile["name"] == "test"
    assert tile["keys"] == ["name", "rank"]
    assert tile["values"] == ["origin", 3]
    feat = tile["features"][0]
    assert feat["type"] == 1
    assert feat["geometry"] == [[(EXTENT // 2, EXTENT // 2)]]
    assert feat["tags"] == [0, 0, 1, 1]


def test_encode_polygon_closes_ring():
    sq = {
        "type": "Polygon",
        "coordinates": [[[-45.0, -30.0], [45.0, -30.0], [45.0, 30.0], [-45.0, 30.0], [-45.0, -30.0]]],
    }
    blob = encode_tile([(sq, {})], 0, 0, 0)
    feat = decode_tile(blob)["features"][0]
    assert feat["type"] == 3
    ring = feat["geometry"][0]
    assert ring[0] == ring[-1]  # ClosePath reconstructed
    xs = [p[0] for p in ring]
    assert min(xs) == EXTENT // 8 * 3  # -45° = 3/8 across
    assert max(xs) == EXTENT // 8 * 5


def test_build_tile_cache_spark(spark):
    rows = []
    for i, x in enumerate([-120.0, -60.0, 0.1, 60.0]):
        g = {
            "type": "Polygon",
            "coordinates": [[[x, 0.1], [x + 10, 0.1], [x + 10, 10.1], [x, 10.1], [x, 0.1]]],
        }
        rows.append((i, f"f{i}", bytearray(geo.wkb_dumps(g)), list(geo.bbox(g))))
    df = spark.createDataFrame(rows, "fid long, name string, geom binary, gfw_bbox array<double>")
    tiles = build_tile_cache(spark, df, zooms=range(0, 3), id_col="fid").collect()
    by_zoom = {}
    for r in tiles:
        by_zoom.setdefault(r["z"], []).append(r)
    # z0: one tile with all 4 features
    assert len(by_zoom[0]) == 1 and by_zoom[0][0]["n_features"] == 4
    # z1: features span west+east hemisphere northern tiles
    assert {(r["x"], r["y"]) for r in by_zoom[1]} == {(0, 0), (1, 0)}
    # every emitted pbf decodes
    for r in tiles:
        decoded = decode_tile(bytes(r["pbf"]))
        assert decoded["extent"] == EXTENT
        assert len(decoded["features"]) == r["n_features"]


def test_tile_clipping_limits_coords(spark):
    # a polygon far bigger than one z2 tile: coordinates must stay within
    # the padded extent after clipping
    g = {
        "type": "Polygon",
        "coordinates": [
            [[-170.0, -80.0], [170.0, -80.0], [170.0, 80.0], [-170.0, 80.0], [-170.0, -80.0]]
        ],
    }
    df = spark.createDataFrame(
        [(1, bytearray(geo.wkb_dumps(g)), list(geo.bbox(g)))],
        "fid long, geom binary, gfw_bbox array<double>",
    )
    tiles = build_tile_cache(spark, df, zooms=range(2, 3), id_col="fid").collect()
    assert len(tiles) == 16  # full 4x4 pyramid level covered
    pad = EXTENT // 8  # 1/16 tile on each side, zigzag rounding slack
    for r in tiles:
        for feat in decode_tile(bytes(r["pbf"]))["features"]:
            for part in feat["geometry"]:
                for px, py in part:
                    assert -pad <= px <= EXTENT + pad
                    assert -pad <= py <= EXTENT + pad


def test_max_features_per_tile_cap(spark):
    rows = []
    for i in range(30):
        g = {
            "type": "Polygon",
            "coordinates": [[[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0], [1.0, 1.0]]],
        }
        rows.append((i, bytearray(geo.wkb_dumps(g)), list(geo.bbox(g))))
    df = spark.createDataFrame(rows, "fid long, geom binary, gfw_bbox array<double>")
    capped = build_tile_cache(
        spark, df, zooms=range(0, 1), id_col="fid", max_features_per_tile=10
    ).collect()
    assert capped[0]["n_features"] == 10
    # deterministic: same cap twice → same pbf
    again = build_tile_cache(
        spark, df, zooms=range(0, 1), id_col="fid", max_features_per_tile=10
    ).collect()
    assert bytes(capped[0]["pbf"]) == bytes(again[0]["pbf"])


def test_write_tile_cache_layout(spark, tmp_path):
    g = {"type": "Point", "coordinates": [10.0, 10.0]}
    df = spark.createDataFrame(
        [(1, bytearray(geo.wkb_dumps(g)), list(geo.bbox(g)))],
        "fid long, geom binary, gfw_bbox array<double>",
    )
    tiles = build_tile_cache(spark, df, zooms=range(0, 2), id_col="fid")
    out = str(tmp_path / "cache")
    write_tile_cache(tiles, out)
    back = spark.read.parquet(out)
    assert back.count() == 2
    assert {r["z"] for r in back.select("z").collect()} == {0, 1}


def test_multipoint_single_moveto():
    """MVT 2.1: POINT geometry with k points = ONE MoveTo with count=k."""
    mp = {"type": "MultiPoint", "coordinates": [[0.0, 0.0], [90.0, 0.0]]}
    blob = encode_tile([(mp, {})], 0, 0, 0)
    # inspect the raw command stream of the only feature
    feat = decode_tile(blob)["features"][0]
    assert feat["type"] == 1
    assert len(feat["geometry"]) == 1 and len(feat["geometry"][0]) == 2
    # raw check: exactly one MoveTo command integer, with count 2
    import gfw_data_api_spark.operators.tilecache as tc

    parts, gtype = tc._tile_local_parts(mp, 0, 0, 0)
    cmds = tc._geometry_commands(parts, closed=False)
    assert cmds[0] == (2 << 3) | 1  # single MoveTo, count=2
    assert len(cmds) == 1 + 4  # command + 2 zigzag pairs, nothing else


def test_default_properties_exclude_system_columns(spark):
    g = {"type": "Point", "coordinates": [10.0, 10.0]}
    df = spark.createDataFrame(
        [(1, "a", bytearray(geo.wkb_dumps(g)), list(geo.bbox(g)), '{"x":1}')],
        "fid long, name string, geom binary, gfw_bbox array<double>, gfw_geojson string",
    )
    tiles = build_tile_cache(spark, df, zooms=range(0, 1), id_col="fid").collect()
    decoded = decode_tile(bytes(tiles[0]["pbf"]))
    assert "gfw_geojson" not in decoded["keys"]
    assert set(decoded["keys"]) == {"fid", "name"}


def test_ring_winding_normalized():
    """MVT 2.1: exteriors positive area (CW in y-down), holes negative —
    regardless of source winding (ESRI inputs arrive CW-outer in lon/lat)."""
    from gfw_data_api_spark.operators.tilecache import _ring_signed_area

    ccw = [[-45.0, -30.0], [45.0, -30.0], [45.0, 30.0], [-45.0, 30.0], [-45.0, -30.0]]
    cw = ccw[::-1]
    hole_ccw = [[-10.0, -10.0], [10.0, -10.0], [10.0, 10.0], [-10.0, 10.0], [-10.0, -10.0]]
    for outer in (ccw, cw):
        for hole in (hole_ccw, hole_ccw[::-1]):
            g = {"type": "Polygon", "coordinates": [outer, hole]}
            feat = decode_tile(encode_tile([(g, {})], 0, 0, 0))["features"][0]
            areas = [_ring_signed_area(r) for r in feat["geometry"]]
            assert areas[0] > 0, f"exterior not CW: {areas}"
            assert areas[1] < 0, f"hole not CCW: {areas}"

    mp = {
        "type": "MultiPolygon",
        "coordinates": [[cw], [[[100.0, 5.0], [110.0, 5.0], [110.0, 15.0], [100.0, 15.0], [100.0, 5.0]]]],
    }
    feat = decode_tile(encode_tile([(mp, {})], 0, 0, 0))["features"][0]
    assert all(_ring_signed_area(r) > 0 for r in feat["geometry"])
