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
