"""A small planar/spherical geometry library.

GEOS (shapely) is not available in this environment, so the ~15 ST_*
operations the reference actually uses (SURVEY.md §2.1 Q11) are
implemented here directly: WKB <-> GeoJSON codecs, bounding boxes,
point-in-polygon, segment/polygon intersection tests, spherical geodesic
area, web-mercator projection, Douglas-Peucker simplification, and point
buffering.

Geometries are GeoJSON-style dicts ``{"type": ..., "coordinates": ...}``;
storage convention is WKB ``BinaryType`` columns plus a ``gfw_bbox``
double-array column used for cheap JVM-side prefiltering, so the Python
predicates below only run on bbox-surviving rows.

Reference parity: PostGIS ST_Intersects / ST_Area(geography) /
ST_AsGeoJSON / ST_GeomFromGeoJSON / ST_Simplify / ST_MakePoint /
ST_Transform(3857) used across batch/scripts/_add_gfw_fields_sql.sh and
app/crud/geostore.py.
"""

from __future__ import annotations

import math
import struct
from typing import Any, Iterable

Geom = dict[str, Any]

_WKB_TYPE_BY_NAME = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
_WKB_NAME_BY_TYPE = {v: k for k, v in _WKB_TYPE_BY_NAME.items()}

# authalic sphere radius for WGS84 (same radius turf.js/PostGIS sphere math uses)
EARTH_RADIUS_M = 6371008.8
WEB_MERCATOR_R = 6378137.0


# --------------------------------------------------------------------------
# WKB codec (2D, both byte orders on read, little-endian on write)
# --------------------------------------------------------------------------


def _read_coords(buf: memoryview, offset: int, n: int, endian: str) -> tuple[list, int]:
    coords = list(struct.unpack_from(f"{endian}{2 * n}d", buf, offset))
    pts = [[coords[2 * i], coords[2 * i + 1]] for i in range(n)]
    return pts, offset + 16 * n


def _parse_wkb(buf: memoryview, offset: int = 0) -> tuple[Geom, int]:
    byte_order = buf[offset]
    endian = "<" if byte_order == 1 else ">"
    (gtype,) = struct.unpack_from(f"{endian}I", buf, offset + 1)
    gtype &= 0xFF  # strip SRID/Z flags (EWKB high bits not used here)
    offset += 5
    name = _WKB_NAME_BY_TYPE[gtype]
    if name == "Point":
        pts, offset = _read_coords(buf, offset, 1, endian)
        return {"type": name, "coordinates": pts[0]}, offset
    if name == "LineString":
        (n,) = struct.unpack_from(f"{endian}I", buf, offset)
        pts, offset = _read_coords(buf, offset + 4, n, endian)
        return {"type": name, "coordinates": pts}, offset
    if name == "Polygon":
        (nrings,) = struct.unpack_from(f"{endian}I", buf, offset)
        offset += 4
        rings = []
        for _ in range(nrings):
            (n,) = struct.unpack_from(f"{endian}I", buf, offset)
            pts, offset = _read_coords(buf, offset + 4, n, endian)
            rings.append(pts)
        return {"type": name, "coordinates": rings}, offset
    if name in ("MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"):
        (n,) = struct.unpack_from(f"{endian}I", buf, offset)
        offset += 4
        parts = []
        for _ in range(n):
            part, offset = _parse_wkb(buf, offset)
            parts.append(part)
        if name == "GeometryCollection":
            return {"type": name, "geometries": parts}, offset
        return {"type": name, "coordinates": [p["coordinates"] for p in parts]}, offset
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_loads(data: bytes) -> Geom:
    geom, _ = _parse_wkb(memoryview(data))
    return geom


def _dump_coords(pts: Iterable[Iterable[float]]) -> bytes:
    flat = [c for pt in pts for c in (pt[0], pt[1])]
    return struct.pack(f"<{len(flat)}d", *flat)


def wkb_dumps(geom: Geom) -> bytes:
    name = geom["type"]
    code = _WKB_TYPE_BY_NAME[name]
    head = struct.pack("<BI", 1, code)
    if name == "Point":
        return head + _dump_coords([geom["coordinates"]])
    if name == "LineString":
        pts = geom["coordinates"]
        return head + struct.pack("<I", len(pts)) + _dump_coords(pts)
    if name == "Polygon":
        rings = geom["coordinates"]
        body = struct.pack("<I", len(rings))
        for ring in rings:
            body += struct.pack("<I", len(ring)) + _dump_coords(ring)
        return head + body
    if name in ("MultiPoint", "MultiLineString", "MultiPolygon"):
        part_type = {"MultiPoint": "Point", "MultiLineString": "LineString", "MultiPolygon": "Polygon"}[name]
        parts = geom["coordinates"]
        body = struct.pack("<I", len(parts))
        for part in parts:
            body += wkb_dumps({"type": part_type, "coordinates": part})
        return head + body
    if name == "GeometryCollection":
        parts = geom["geometries"]
        body = struct.pack("<I", len(parts))
        for part in parts:
            body += wkb_dumps(part)
        return head + body
    raise ValueError(f"unsupported geometry type {name}")


# --------------------------------------------------------------------------
# bbox / predicates
# --------------------------------------------------------------------------


def _iter_points(geom: Geom):
    name = geom["type"]
    coords = geom.get("coordinates")
    if name == "Point":
        yield coords
    elif name in ("LineString", "MultiPoint"):
        yield from coords
    elif name in ("Polygon", "MultiLineString"):
        for ring in coords:
            yield from ring
    elif name == "MultiPolygon":
        for poly in coords:
            for ring in poly:
                yield from ring
    elif name == "GeometryCollection":
        for part in geom["geometries"]:
            yield from _iter_points(part)


def bbox(geom: Geom) -> tuple[float, float, float, float]:
    xs, ys = zip(*((p[0], p[1]) for p in _iter_points(geom)))
    return (min(xs), min(ys), max(xs), max(ys))


def bbox_overlaps(a: tuple, b: tuple) -> bool:
    return not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1])


def _on_segment(p, a, b, eps=1e-12) -> bool:
    cross = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    if abs(cross) > eps * max(1.0, abs(b[0] - a[0]) + abs(b[1] - a[1])):
        return False
    return (
        min(a[0], b[0]) - eps <= p[0] <= max(a[0], b[0]) + eps
        and min(a[1], b[1]) - eps <= p[1] <= max(a[1], b[1]) + eps
    )


def point_in_ring(pt, ring) -> bool:
    """Ray casting; boundary points count as inside."""
    x, y = pt[0], pt[1]
    inside = False
    n = len(ring)
    for i in range(n - 1):
        a, b = ring[i], ring[i + 1]
        if _on_segment(pt, a, b):
            return True
        if (a[1] > y) != (b[1] > y):
            x_cross = a[0] + (y - a[1]) * (b[0] - a[0]) / (b[1] - a[1])
            if x < x_cross:
                inside = not inside
    return inside


def point_in_polygon(pt, polygon_coords) -> bool:
    if not point_in_ring(pt, polygon_coords[0]):
        return False
    for hole in polygon_coords[1:]:
        # on a hole's boundary still touches the polygon
        if point_in_ring(pt, hole) and not any(
            _on_segment(pt, hole[i], hole[i + 1]) for i in range(len(hole) - 1)
        ):
            return False
    return True


def _segments(geom: Geom):
    name = geom["type"]
    coords = geom.get("coordinates")
    if name == "LineString":
        yield from zip(coords[:-1], coords[1:])
    elif name == "Polygon":
        for ring in coords:
            yield from zip(ring[:-1], ring[1:])
    elif name == "MultiLineString":
        for line in coords:
            yield from zip(line[:-1], line[1:])
    elif name == "MultiPolygon":
        for poly in coords:
            for ring in poly:
                yield from zip(ring[:-1], ring[1:])


def _seg_intersect(p1, p2, p3, p4) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        if abs(v) < 1e-15:
            return 0
        return 1 if v > 0 else -1

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    return (
        (o1 == 0 and _on_segment(p3, p1, p2))
        or (o2 == 0 and _on_segment(p4, p1, p2))
        or (o3 == 0 and _on_segment(p1, p3, p4))
        or (o4 == 0 and _on_segment(p2, p3, p4))
    )


def _polygons_of(geom: Geom):
    if geom["type"] == "Polygon":
        yield geom["coordinates"]
    elif geom["type"] == "MultiPolygon":
        yield from geom["coordinates"]
    elif geom["type"] == "GeometryCollection":
        for part in geom["geometries"]:
            yield from _polygons_of(part)


def intersects(a: Geom, b: Geom) -> bool:
    """ST_Intersects for Point/Line/Polygon/Multi* combinations."""
    if not bbox_overlaps(bbox(a), bbox(b)):
        return False
    a_polys, b_polys = list(_polygons_of(a)), list(_polygons_of(b))

    # point against anything
    def points_of(g):
        if g["type"] == "Point":
            return [g["coordinates"]]
        if g["type"] == "MultiPoint":
            return g["coordinates"]
        return []

    for pt in points_of(a):
        if b_polys and any(point_in_polygon(pt, poly) for poly in b_polys):
            return True
        if any(_on_segment(pt, s[0], s[1]) for s in _segments(b)):
            return True
        for q in points_of(b):
            if abs(pt[0] - q[0]) < 1e-12 and abs(pt[1] - q[1]) < 1e-12:
                return True
    for pt in points_of(b):
        if a_polys and any(point_in_polygon(pt, poly) for poly in a_polys):
            return True
        if any(_on_segment(pt, s[0], s[1]) for s in _segments(a)):
            return True
    if points_of(a) or points_of(b):
        return False

    # any edge crossing
    segs_a = list(_segments(a))
    segs_b = list(_segments(b))
    for s1 in segs_a:
        for s2 in segs_b:
            if _seg_intersect(s1[0], s1[1], s2[0], s2[1]):
                return True
    # containment without boundary crossing
    for poly in b_polys:
        if segs_a and point_in_polygon(segs_a[0][0], poly):
            return True
    for poly in a_polys:
        if segs_b and point_in_polygon(segs_b[0][0], poly):
            return True
    return False


# --------------------------------------------------------------------------
# spherical measures / transforms
# --------------------------------------------------------------------------


def _ring_area_sq_m(ring) -> float:
    """Signed spherical ring area (Chamberlain & Duquette formula)."""
    if len(ring) < 4:
        return 0.0
    total = 0.0
    for i in range(len(ring) - 1):
        lon1, lat1 = ring[i][0], ring[i][1]
        lon2, lat2 = ring[i + 1][0], ring[i + 1][1]
        total += math.radians(lon2 - lon1) * (
            2 + math.sin(math.radians(lat1)) + math.sin(math.radians(lat2))
        )
    return total * EARTH_RADIUS_M * EARTH_RADIUS_M / 2.0


def geodesic_area_sq_m(geom: Geom) -> float:
    """ST_Area(geom::geography) analog: spherical area in m²; holes subtract."""
    area = 0.0
    for poly in _polygons_of(geom):
        outer = abs(_ring_area_sq_m(poly[0]))
        holes = sum(abs(_ring_area_sq_m(r)) for r in poly[1:])
        area += max(outer - holes, 0.0)
    return area


def geodesic_area_ha(geom: Geom) -> float:
    """gfw_area__ha derivation (batch/scripts/_fill_gfw_fields_sql.sh)."""
    return geodesic_area_sq_m(geom) / 10_000.0


def pixel_area_ha(lat_center_deg: float, pixel_size_deg: float) -> float:
    """Geodesic area of a pixel_size×pixel_size cell centered at a latitude —
    the reserved ``area__ha`` raster column (SURVEY.md §2.4 R7)."""
    lat1 = math.radians(lat_center_deg - pixel_size_deg / 2.0)
    lat2 = math.radians(lat_center_deg + pixel_size_deg / 2.0)
    dlon = math.radians(pixel_size_deg)
    return abs(EARTH_RADIUS_M**2 * dlon * (math.sin(lat2) - math.sin(lat1))) / 10_000.0


def web_mercator(lon: float, lat: float) -> tuple[float, float]:
    x = WEB_MERCATOR_R * math.radians(lon)
    y = WEB_MERCATOR_R * math.log(math.tan(math.pi / 4.0 + math.radians(lat) / 2.0))
    return x, y


def simplify(geom: Geom, tolerance: float) -> Geom:
    """Douglas-Peucker simplification (ST_Simplify analog)."""

    def _dp(points, tol):
        if len(points) < 3:
            return points
        a, b = points[0], points[-1]
        max_d, idx = -1.0, 0
        dx, dy = b[0] - a[0], b[1] - a[1]
        norm = math.hypot(dx, dy)
        for i in range(1, len(points) - 1):
            p = points[i]
            if norm == 0:
                d = math.hypot(p[0] - a[0], p[1] - a[1])
            else:
                d = abs(dx * (a[1] - p[1]) - dy * (a[0] - p[0])) / norm
            if d > max_d:
                max_d, idx = d, i
        if max_d <= tol:
            return [a, b]
        return _dp(points[: idx + 1], tol)[:-1] + _dp(points[idx:], tol)

    def _simplify_ring(ring):
        out = _dp(ring, tolerance)
        if len(out) < 4:
            return ring  # refuse to collapse rings below validity
        return out

    name = geom["type"]
    if name == "LineString":
        return {"type": name, "coordinates": _dp(geom["coordinates"], tolerance)}
    if name == "Polygon":
        return {"type": name, "coordinates": [_simplify_ring(r) for r in geom["coordinates"]]}
    if name == "MultiPolygon":
        return {
            "type": name,
            "coordinates": [[_simplify_ring(r) for r in poly] for poly in geom["coordinates"]],
        }
    return geom


def buffer_point(lon: float, lat: float, radius_m: float, segments: int = 32) -> Geom:
    """Azimuthal-equidistant circular buffer around a point — the
    features-by-location lookup geometry (app/routes/datasets/features.py:
    150-218 builds the same buffer via PostGIS)."""
    coslat = max(math.cos(math.radians(lat)), 1e-9)
    dlat = radius_m / 110_574.0
    dlon = radius_m / (111_320.0 * coslat)
    ring = []
    for i in range(segments + 1):
        ang = 2.0 * math.pi * i / segments
        ring.append([lon + dlon * math.cos(ang), lat + dlat * math.sin(ang)])
    return {"type": "Polygon", "coordinates": [ring]}


def envelope(geom: Geom) -> Geom:
    xmin, ymin, xmax, ymax = bbox(geom)
    return {
        "type": "Polygon",
        "coordinates": [[[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]],
    }


def make_envelope(xmin: float, ymin: float, xmax: float, ymax: float) -> Geom:
    """ST_MakeEnvelope analog (SRID is implicit 4326 everywhere here)."""
    return {
        "type": "Polygon",
        "coordinates": [[[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]],
    }


def geometry_type(geom: Geom) -> str:
    """ST_GeometryType analog: 'ST_Polygon', 'ST_MultiPolygon', …"""
    return f"ST_{geom['type']}"


def multi(geom: Geom) -> Geom:
    """ST_Multi analog: promote single-part geometries to their Multi*."""
    name = geom["type"]
    if name in ("Point", "LineString", "Polygon"):
        return {"type": f"Multi{name}", "coordinates": [geom["coordinates"]]}
    return geom


def snap_to_grid(geom: Geom, size: float) -> Geom | None:
    """ST_SnapToGrid analog: round every coordinate to multiples of
    ``size``, dropping consecutive duplicates and rings that collapse
    below validity. Returns None when the whole geometry collapses."""

    def snap_pt(p):
        return [round(p[0] / size) * size, round(p[1] / size) * size]

    def snap_line(pts, closed: bool):
        out: list = []
        for p in map(snap_pt, pts):
            if not out or p != out[-1]:
                out.append(p)
        if closed:
            if out and out[0] != out[-1]:
                out.append(out[0])
            return out if len(out) >= 4 else None
        return out if len(out) >= 2 else None

    name = geom["type"]
    if name == "Point":
        return {"type": name, "coordinates": snap_pt(geom["coordinates"])}
    if name == "MultiPoint":
        pts = []
        for p in map(snap_pt, geom["coordinates"]):
            if p not in pts:
                pts.append(p)
        return {"type": name, "coordinates": pts}
    if name == "LineString":
        line = snap_line(geom["coordinates"], closed=False)
        return {"type": name, "coordinates": line} if line else None
    if name == "MultiLineString":
        lines = [ln for ln in (snap_line(c, False) for c in geom["coordinates"]) if ln]
        return {"type": name, "coordinates": lines} if lines else None
    if name == "Polygon":
        rings = [r for r in (snap_line(c, True) for c in geom["coordinates"]) if r]
        if not rings or snap_line(geom["coordinates"][0], True) is None:
            return None
        return {"type": name, "coordinates": rings}
    if name == "MultiPolygon":
        polys = []
        for poly in geom["coordinates"]:
            rings = [r for r in (snap_line(c, True) for c in poly) if r]
            if rings and snap_line(poly[0], True) is not None:
                polys.append(rings)
        return {"type": name, "coordinates": polys} if polys else None
    return geom


def _clip_ring_to_box(ring, xmin, ymin, xmax, ymax):
    """Sutherland–Hodgman: clip one ring against the 4 box half-planes."""
    edges = (
        (lambda p: p[0] >= xmin, lambda a, b: _edge_x(a, b, xmin)),
        (lambda p: p[0] <= xmax, lambda a, b: _edge_x(a, b, xmax)),
        (lambda p: p[1] >= ymin, lambda a, b: _edge_y(a, b, ymin)),
        (lambda p: p[1] <= ymax, lambda a, b: _edge_y(a, b, ymax)),
    )
    pts = ring[:-1] if ring and ring[0] == ring[-1] else list(ring)
    for inside, cross in edges:
        if not pts:
            return None
        out = []
        for i, cur in enumerate(pts):
            prev = pts[i - 1]
            cur_in, prev_in = inside(cur), inside(prev)
            if cur_in:
                if not prev_in:
                    out.append(cross(prev, cur))
                out.append(list(cur))
            elif prev_in:
                out.append(cross(prev, cur))
        pts = out
    if len(pts) < 3:
        return None
    # drop consecutive duplicates introduced by corner crossings
    dedup = [p for i, p in enumerate(pts) if p != pts[i - 1]] if pts else pts
    if len(dedup) < 3:
        return None
    return dedup + [dedup[0]]


def _edge_x(a, b, x):
    t = (x - a[0]) / (b[0] - a[0])
    return [x, a[1] + t * (b[1] - a[1])]


def _edge_y(a, b, y):
    t = (y - a[1]) / (b[1] - a[1])
    return [a[0] + t * (b[0] - a[0]), y]


def _clip_segment_to_box(a, b, xmin, ymin, xmax, ymax):
    """Liang–Barsky segment clip; returns (p0, p1) or None."""
    dx, dy = b[0] - a[0], b[1] - a[1]
    t0, t1 = 0.0, 1.0
    for p, q in (
        (-dx, a[0] - xmin),
        (dx, xmax - a[0]),
        (-dy, a[1] - ymin),
        (dy, ymax - a[1]),
    ):
        if p == 0:
            if q < 0:
                return None
            continue
        r = q / p
        if p < 0:
            if r > t1:
                return None
            t0 = max(t0, r)
        else:
            if r < t0:
                return None
            t1 = min(t1, r)
    return (
        [a[0] + t0 * dx, a[1] + t0 * dy],
        [a[0] + t1 * dx, a[1] + t1 * dy],
    )


def clip_to_box(geom: Geom, xmin: float, ymin: float, xmax: float, ymax: float) -> Geom | None:
    """ST_Intersection(geom, ST_MakeEnvelope(...)) analog — the exact
    operation the reference's 1×1-grid export runs per tile
    (batch/python/export_1x1_grid.py:309-381). Axis-aligned box clipping
    only: Sutherland–Hodgman for polygon rings (holes clipped per-ring),
    Liang–Barsky for lines, containment filter for points. Returns None
    for an empty intersection."""
    gx0, gy0, gx1, gy1 = bbox(geom)
    if gx1 < xmin or gx0 > xmax or gy1 < ymin or gy0 > ymax:
        return None
    if gx0 >= xmin and gx1 <= xmax and gy0 >= ymin and gy1 <= ymax:
        return geom  # fully inside: identity (fast path for interior tiles)

    name = geom["type"]

    def in_box(p):
        return xmin <= p[0] <= xmax and ymin <= p[1] <= ymax

    if name == "Point":
        return geom if in_box(geom["coordinates"]) else None
    if name == "MultiPoint":
        pts = [p for p in geom["coordinates"] if in_box(p)]
        return {"type": name, "coordinates": pts} if pts else None
    if name in ("LineString", "MultiLineString"):
        lines = geom["coordinates"] if name == "MultiLineString" else [geom["coordinates"]]
        out_lines = []
        for line in lines:
            run: list = []
            for a, b in zip(line[:-1], line[1:]):
                seg = _clip_segment_to_box(a, b, xmin, ymin, xmax, ymax)
                if seg is None:
                    if len(run) >= 2:
                        out_lines.append(run)
                    run = []
                    continue
                if run and run[-1] == seg[0]:
                    run.append(seg[1])
                else:
                    if len(run) >= 2:
                        out_lines.append(run)
                    run = list(seg)
            if len(run) >= 2:
                out_lines.append(run)
        if not out_lines:
            return None
        if len(out_lines) == 1:
            return {"type": "LineString", "coordinates": out_lines[0]}
        return {"type": "MultiLineString", "coordinates": out_lines}
    if name in ("Polygon", "MultiPolygon"):
        polys = geom["coordinates"] if name == "MultiPolygon" else [geom["coordinates"]]
        out_polys = []
        for poly in polys:
            outer = _clip_ring_to_box(poly[0], xmin, ymin, xmax, ymax)
            if outer is None:
                continue
            rings = [outer]
            for hole in poly[1:]:
                clipped = _clip_ring_to_box(hole, xmin, ymin, xmax, ymax)
                if clipped is not None:
                    rings.append(clipped)
            out_polys.append(rings)
        if not out_polys:
            return None
        if len(out_polys) == 1:
            return {"type": "Polygon", "coordinates": out_polys[0]}
        return {"type": "MultiPolygon", "coordinates": out_polys}
    if name == "GeometryCollection":
        parts = [
            c
            for c in (clip_to_box(g, xmin, ymin, xmax, ymax) for g in geom["geometries"])
            if c is not None
        ]
        return {"type": name, "geometries": parts} if parts else None
    return None


def within(a: Geom, b: Geom) -> bool:
    """ST_Within analog for point/line/polygon `a` against polygon/multi
    `b`: every vertex of `a` inside some polygon of `b` and no boundary
    crossing."""
    b_polys = list(_polygons_of(b))
    if not b_polys:
        return False
    pts = list(_iter_points(a))
    if not pts:
        return False
    for pt in pts:
        if not any(point_in_polygon(pt, poly) for poly in b_polys):
            return False
    if a["type"] == "Point" or a["type"] == "MultiPoint":
        return True
    segs_b = list(_segments(b))
    for s1 in _segments(a):
        crossing_ts = _segment_crossing_params(s1[0], s1[1], segs_b)
        if not crossing_ts:
            continue
        # split the segment at every boundary crossing and test each
        # piece's midpoint: touching the boundary from inside is still
        # within, but any piece whose interior escapes b means not-within
        # (a single midpoint test misses exits through concavities)
        ts = sorted({0.0, 1.0, *crossing_ts})
        for t0, t1 in zip(ts[:-1], ts[1:]):
            tm = (t0 + t1) / 2.0
            mid = [
                s1[0][0] + tm * (s1[1][0] - s1[0][0]),
                s1[0][1] + tm * (s1[1][1] - s1[0][1]),
            ]
            if not any(point_in_polygon(mid, poly) for poly in b_polys):
                return False
    return True


def _segment_crossing_params(p1, p2, segs) -> list[float]:
    """Parameters t ∈ (0,1) where segment p1→p2 meets any of ``segs``."""
    out: list[float] = []
    dx, dy = p2[0] - p1[0], p2[1] - p1[1]
    for a, b in segs:
        if not _seg_intersect(p1, p2, a, b):
            continue
        ex, ey = b[0] - a[0], b[1] - a[1]
        denom = dx * ey - dy * ex
        if abs(denom) < 1e-18:
            # collinear overlap: project the edge endpoints onto p1→p2
            L2 = dx * dx + dy * dy
            if L2 > 0:
                for q in (a, b):
                    t = ((q[0] - p1[0]) * dx + (q[1] - p1[1]) * dy) / L2
                    if 0.0 < t < 1.0:
                        out.append(t)
            continue
        t = ((a[0] - p1[0]) * ey - (a[1] - p1[1]) * ex) / denom
        if 0.0 < t < 1.0:
            out.append(t)
    return out
