"""Property-based tests (hypothesis) for the geometry library's clipping
and snapping — membership invariants over random convex polygons and
boxes (Sutherland–Hodgman is exact for convex subjects, and our
non-convex usage clips rings independently, covered by golden tests)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from gfw_data_api_spark.functions import geometry as geo


def _convex_polygon(points: list[tuple[float, float]]) -> dict | None:
    """Convex hull (monotone chain); None if degenerate."""
    pts = sorted(set(points))
    if len(pts) < 3:
        return None

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in reversed(pts):
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = lower[:-1] + upper[:-1]
    if len(hull) < 3:
        return None
    ring = [[x, y] for x, y in hull] + [[hull[0][0], hull[0][1]]]
    return {"type": "Polygon", "coordinates": [ring]}


coords = st.floats(min_value=-50, max_value=50, allow_nan=False, width=32)
point_lists = st.lists(st.tuples(coords, coords), min_size=3, max_size=12)
boxes = st.tuples(coords, coords, coords, coords).map(
    lambda t: (min(t[0], t[2]), min(t[1], t[3]), max(t[0], t[2]), max(t[1], t[3]))
)


@given(point_lists, boxes, st.lists(st.tuples(coords, coords), min_size=5, max_size=5))
@settings(max_examples=200, deadline=None)
def test_clip_membership_invariant(points, box, probes):
    poly = _convex_polygon(points)
    if poly is None:
        return
    xmin, ymin, xmax, ymax = box
    if xmax - xmin < 1e-6 or ymax - ymin < 1e-6:
        return
    clipped = geo.clip_to_box(poly, xmin, ymin, xmax, ymax)
    eps = 1e-7
    for px, py in probes:
        strictly_in_box = xmin + eps < px < xmax - eps and ymin + eps < py < ymax - eps
        in_poly = geo.point_in_polygon([px, py], poly["coordinates"])
        # skip probes within eps of the polygon boundary (inclusion is
        # boundary-inclusive and FP-sensitive there)
        near_edge = any(
            _dist_to_segment((px, py), a, b) < 1e-6 for a, b in geo._segments(poly)
        )
        if near_edge or not strictly_in_box:
            continue
        in_clip = clipped is not None and geo.point_in_polygon(
            [px, py], clipped["coordinates"]
        )
        assert in_clip == in_poly, (poly, box, (px, py))


def _dist_to_segment(p, a, b):
    ax, ay = a
    bx, by = b
    dx, dy = bx - ax, by - ay
    L2 = dx * dx + dy * dy
    if L2 == 0:
        return math.hypot(p[0] - ax, p[1] - ay)
    t = max(0.0, min(1.0, ((p[0] - ax) * dx + (p[1] - ay) * dy) / L2))
    return math.hypot(p[0] - (ax + t * dx), p[1] - (ay + t * dy))


@given(point_lists, boxes)
@settings(max_examples=200, deadline=None)
def test_clip_stays_inside_box(points, box):
    poly = _convex_polygon(points)
    if poly is None:
        return
    xmin, ymin, xmax, ymax = box
    if xmax <= xmin or ymax <= ymin:
        return
    clipped = geo.clip_to_box(poly, xmin, ymin, xmax, ymax)
    if clipped is None:
        return
    cx0, cy0, cx1, cy1 = geo.bbox(clipped)
    tol = 1e-9
    assert cx0 >= xmin - tol and cy0 >= ymin - tol
    assert cx1 <= xmax + tol and cy1 <= ymax + tol


@given(point_lists, st.floats(min_value=0.01, max_value=5.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_snap_to_grid_idempotent(points, size):
    poly = _convex_polygon(points)
    if poly is None:
        return
    once = geo.snap_to_grid(poly, size)
    if once is None:
        return
    twice = geo.snap_to_grid(once, size)
    assert twice == once


@given(point_lists)
@settings(max_examples=200, deadline=None)
def test_wkb_roundtrip_random_polygons(points):
    poly = _convex_polygon(points)
    if poly is None:
        return
    assert geo.wkb_loads(geo.wkb_dumps(poly)) == poly
