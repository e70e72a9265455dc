"""Unit tests for the pure-Python geometry library."""

import math

import pytest

from gfw_data_api_spark.functions import geometry as geo

SQUARE = {
    "type": "Polygon",
    "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
}
FAR_SQUARE = {
    "type": "Polygon",
    "coordinates": [[[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]]],
}


def test_wkb_roundtrip_point():
    g = {"type": "Point", "coordinates": [10.5, -33.25]}
    assert geo.wkb_loads(geo.wkb_dumps(g)) == g


def test_wkb_roundtrip_polygon():
    assert geo.wkb_loads(geo.wkb_dumps(SQUARE)) == SQUARE


def test_wkb_roundtrip_multipolygon():
    g = {"type": "MultiPolygon", "coordinates": [SQUARE["coordinates"], FAR_SQUARE["coordinates"]]}
    assert geo.wkb_loads(geo.wkb_dumps(g)) == g


def test_bbox():
    assert geo.bbox(SQUARE) == (0, 0, 1, 1)


def test_point_in_polygon():
    assert geo.point_in_polygon([0.5, 0.5], SQUARE["coordinates"])
    assert not geo.point_in_polygon([1.5, 0.5], SQUARE["coordinates"])
    # boundary counts as inside
    assert geo.point_in_polygon([0.0, 0.5], SQUARE["coordinates"])


def test_polygon_with_hole():
    donut = [
        [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
        [[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]],
    ]
    assert geo.point_in_polygon([0.5, 0.5], donut)
    assert not geo.point_in_polygon([2, 2], donut)


def test_intersects_disjoint():
    assert not geo.intersects(SQUARE, FAR_SQUARE)


def test_intersects_overlap():
    other = {"type": "Polygon", "coordinates": [[[0.5, 0.5], [2, 0.5], [2, 2], [0.5, 2], [0.5, 0.5]]]}
    assert geo.intersects(SQUARE, other)


def test_intersects_containment():
    inner = {"type": "Polygon", "coordinates": [[[0.4, 0.4], [0.6, 0.4], [0.6, 0.6], [0.4, 0.6], [0.4, 0.4]]]}
    assert geo.intersects(SQUARE, inner)
    assert geo.intersects(inner, SQUARE)


def test_intersects_point():
    assert geo.intersects({"type": "Point", "coordinates": [0.5, 0.5]}, SQUARE)
    assert not geo.intersects({"type": "Point", "coordinates": [2, 2]}, SQUARE)


def test_geodesic_area_one_degree_at_equator():
    # 1°x1° cell at the equator ≈ 12,364 km² on the sphere
    area_km2 = geo.geodesic_area_sq_m(SQUARE) / 1e6
    assert area_km2 == pytest.approx(12364, rel=0.01)


def test_pixel_area_matches_ring_area():
    cell = {
        "type": "Polygon",
        "coordinates": [[[10, 44.995], [10.01, 44.995], [10.01, 45.005], [10, 45.005], [10, 44.995]]],
    }
    assert geo.pixel_area_ha(45.0, 0.01) == pytest.approx(geo.geodesic_area_ha(cell), rel=1e-6)


def test_web_mercator_known_point():
    x, y = geo.web_mercator(0, 0)
    assert x == pytest.approx(0, abs=1e-6) and y == pytest.approx(0, abs=1e-6)
    x, _ = geo.web_mercator(180, 0)
    assert x == pytest.approx(math.pi * geo.WEB_MERCATOR_R)


def test_simplify_keeps_endpoints():
    line = {"type": "LineString", "coordinates": [[0, 0], [1, 0.001], [2, 0]]}
    out = geo.simplify(line, 0.01)
    assert out["coordinates"] == [[0, 0], [2, 0]]


def test_buffer_point_contains_center():
    buf = geo.buffer_point(10, 45, 1000)
    assert geo.point_in_polygon([10, 45], buf["coordinates"])
    # ~1km radius → no vertex farther than ~0.02 degrees
    for x, y in buf["coordinates"][0]:
        assert abs(x - 10) < 0.02 and abs(y - 45) < 0.02


# --------------------------------------------------------------------------
# clip / snap / within / type helpers
# --------------------------------------------------------------------------


def test_clip_polygon_straddling_box():
    out = geo.clip_to_box(SQUARE, 0.5, -1.0, 2.0, 2.0)
    assert out["type"] == "Polygon"
    assert geo.bbox(out) == (0.5, 0.0, 1.0, 1.0)
    # area halves exactly for the axis cut
    assert geo.geodesic_area_sq_m(out) == pytest.approx(
        geo.geodesic_area_sq_m(SQUARE) / 2, rel=1e-6
    )


def test_clip_polygon_fully_inside_is_identity():
    assert geo.clip_to_box(SQUARE, -5, -5, 5, 5) is SQUARE


def test_clip_polygon_disjoint_is_none():
    assert geo.clip_to_box(SQUARE, 10, 10, 11, 11) is None


def test_clip_polygon_with_hole():
    donut = {
        "type": "Polygon",
        "coordinates": [
            [[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]],
            [[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]],
        ],
    }
    out = geo.clip_to_box(donut, -1, -1, 2, 2)
    assert out["type"] == "Polygon"
    assert len(out["coordinates"]) == 2  # hole survives the clip
    assert geo.bbox(out) == (0, 0, 2, 2)
    # clipped hole quarter [1,2]×[1,2] subtracts from the outer quarter
    assert not geo.point_in_polygon([1.5, 1.5], out["coordinates"])
    assert geo.point_in_polygon([0.5, 0.5], out["coordinates"])


def test_clip_multipolygon_drops_outside_parts():
    multi = {
        "type": "MultiPolygon",
        "coordinates": [SQUARE["coordinates"], FAR_SQUARE["coordinates"]],
    }
    out = geo.clip_to_box(multi, -1, -1, 2, 2)
    assert out["type"] == "Polygon"  # single surviving part
    assert geo.bbox(out) == (0, 0, 1, 1)


def test_clip_linestring_reentry():
    # leaves the box and comes back: two output runs
    zig = {
        "type": "LineString",
        "coordinates": [[-1, 0.25], [0.5, 0.25], [1.5, 0.25], [1.5, 0.75], [0.5, 0.75]],
    }
    out = geo.clip_to_box(zig, 0, 0, 1, 1)
    assert out["type"] == "MultiLineString"
    assert len(out["coordinates"]) == 2


def test_clip_points():
    mp = {"type": "MultiPoint", "coordinates": [[0.5, 0.5], [9, 9]]}
    out = geo.clip_to_box(mp, 0, 0, 1, 1)
    assert out["coordinates"] == [[0.5, 0.5]]
    assert geo.clip_to_box({"type": "Point", "coordinates": [9, 9]}, 0, 0, 1, 1) is None


def test_snap_to_grid():
    g = {"type": "Polygon", "coordinates": [[[0.04, 0.04], [1.04, 0.04], [1.04, 1.04], [0.04, 1.04], [0.04, 0.04]]]}
    snapped = geo.snap_to_grid(g, 0.1)
    assert snapped["coordinates"][0][0] == [0.0, 0.0]
    # collapse: a sliver narrower than the grid vanishes
    sliver = {"type": "Polygon", "coordinates": [[[0, 0], [0.01, 0], [0.01, 0.01], [0, 0.01], [0, 0]]]}
    assert geo.snap_to_grid(sliver, 1.0) is None


def test_within():
    inner = {"type": "Polygon", "coordinates": [[[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.8], [0.2, 0.2]]]}
    assert geo.within(inner, SQUARE)
    assert not geo.within(SQUARE, inner)
    assert geo.within({"type": "Point", "coordinates": [0.5, 0.5]}, SQUARE)
    assert not geo.within({"type": "Point", "coordinates": [5, 5]}, SQUARE)
    # overlapping-but-not-contained
    shifted = {"type": "Polygon", "coordinates": [[[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]]]}
    assert not geo.within(shifted, SQUARE)


def test_type_multi_envelope_helpers():
    assert geo.geometry_type(SQUARE) == "ST_Polygon"
    m = geo.multi(SQUARE)
    assert m["type"] == "MultiPolygon"
    assert geo.multi(m) is m
    env = geo.make_envelope(0, 0, 2, 1)
    assert geo.bbox(env) == (0, 0, 2, 1)


def test_within_concavity_escape():
    """Review finding: a segment exiting through a notch whose midpoint is
    still inside must NOT count as within."""
    notched = {
        "type": "Polygon",
        "coordinates": [[
            [0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.7, 1.0],
            [0.7, 0.5], [0.6, 0.5], [0.6, 1.0], [0.0, 1.0], [0.0, 0.0],
        ]],
    }
    line = {"type": "LineString", "coordinates": [[0.1, 0.9], [0.9, 0.9]]}
    assert not geo.within(line, notched)
    # a line below the notch stays within
    low = {"type": "LineString", "coordinates": [[0.1, 0.2], [0.9, 0.2]]}
    assert geo.within(low, notched)
