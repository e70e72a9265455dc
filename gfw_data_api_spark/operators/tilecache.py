"""E15: static vector tile cache — Mapbox Vector Tiles, Spark-first.

The reference shells out to tippecanoe over exported NDJSON
(batch/scripts/create_vector_tile_cache.sh, creation options
app/models/pydantic/creation_options.py:501-505: zoom range + density
strategies). No tippecanoe here, so the MVT container (public spec,
Mapbox vector-tile-spec 2.1 — protobuf wire format with zigzag-delta
geometry commands) is encoded directly, and the tiling itself is the
Spark job:

1. features explode to the (z, x, y) web-mercator tiles their bbox
   touches — native column math, the same grid-explode shape as the
   spatial join (no cross join, no driver loop);
2. one ``applyInPandas`` per tile group clips each feature to the
   padded tile, projects to integer tile coordinates, and emits the
   encoded ``.pbf`` blob;
3. the result is a ``(z, x, y, pbf)`` DataFrame — write it partitioned
   by z/x and any tile server can serve the directory.

Density strategy: ``max_features_per_tile`` keeps the N features with
the smallest xxhash64(feature id, z, x, y) — deterministic, stable
across runs, and spread uniformly (the ``drop-densest`` analog; the
reference's other strategies are tippecanoe heuristics over point
density).
"""

from __future__ import annotations

import math
import struct
import zlib  # noqa: F401  (kept for parity with gzip-serving caches)

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfw_data_api_spark.functions import geometry as geo

EXTENT = 4096
_WM_MAX = 20037508.342789244


# ---------------------------------------------------------------------------
# protobuf wire helpers
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _field(num: int, wire: int) -> bytes:
    return _varint((num << 3) | wire)


def _len_field(num: int, payload: bytes) -> bytes:
    return _field(num, 2) + _varint(len(payload)) + payload


def _mvt_value(v) -> bytes:
    if isinstance(v, bool):
        return _field(7, 0) + _varint(1 if v else 0)
    if isinstance(v, int):
        return _field(6, 0) + _varint(_zigzag(v))
    if isinstance(v, float):
        return _field(3, 1) + struct.pack("<d", v)
    return _len_field(1, str(v).encode("utf-8"))


def _geometry_commands(parts: list[list[tuple[int, int]]], closed: bool) -> list[int]:
    """MoveTo/LineTo/ClosePath command stream with zigzag deltas."""
    cmds: list[int] = []
    cx = cy = 0
    if not closed and all(len(p) == 1 for p in parts):
        # POINT geometry: MVT 2.1 requires a SINGLE MoveTo whose count is
        # the number of points (k separate MoveTo commands are invalid to
        # spec-conforming renderers)
        pts = [p[0] for p in parts]
        cmds.append((len(pts) << 3) | 1)
        for x, y in pts:
            cmds += [_zigzag(x - cx), _zigzag(y - cy)]
            cx, cy = x, y
        return cmds
    for part in parts:
        pts = part[:-1] if closed and len(part) > 1 and part[0] == part[-1] else part
        if len(pts) < (3 if closed else 2) and not (len(pts) == 1 and not closed):
            continue
        cmds.append((1 << 3) | 1)  # MoveTo ×1
        dx, dy = pts[0][0] - cx, pts[0][1] - cy
        cmds += [_zigzag(dx), _zigzag(dy)]
        cx, cy = pts[0]
        rest = pts[1:]
        if rest:
            cmds.append((len(rest) << 3) | 2)  # LineTo ×n
            for x, y in rest:
                cmds += [_zigzag(x - cx), _zigzag(y - cy)]
                cx, cy = x, y
        if closed:
            cmds.append((1 << 3) | 7)  # ClosePath
    return cmds


def _ring_signed_area(ring: list[tuple[int, int]]) -> float:
    """Shoelace signed area in tile coordinates (y down).

    MVT 2.1 defines ring orientation by the surveyor's formula over tile
    coordinates: exterior rings MUST have positive area (visually clockwise
    in the y-down grid), interior rings negative.
    """
    pts = ring[:-1] if len(ring) > 1 and ring[0] == ring[-1] else ring
    a = 0
    for i in range(len(pts)):
        x1, y1 = pts[i]
        x2, y2 = pts[(i + 1) % len(pts)]
        a += x1 * y2 - x2 * y1
    return a / 2.0


def _orient_rings(
    rings: list[list[tuple[int, int]]], exterior_flags: list[bool]
) -> list[list[tuple[int, int]]]:
    """Force exterior rings to positive signed area and holes to negative.

    Source data keeps its native winding (ESRI formats are CW-outer in
    lon/lat, which flips sign after the y-down projection), so winding must
    be normalized HERE, post-projection — conforming renderers otherwise
    treat a negative-area exterior as an interior ring.
    """
    out = []
    for ring, is_exterior in zip(rings, exterior_flags):
        a = _ring_signed_area(ring)
        if (is_exterior and a < 0) or (not is_exterior and a > 0):
            ring = ring[::-1]
        out.append(ring)
    return out


def _tile_local_parts(g: geo.Geom, z: int, x: int, y: int):
    """Project geometry to integer tile coordinates (EXTENT grid, y down).

    Returns (parts, geom_type) with MVT type 1=point 2=line 3=polygon.
    """
    scale = 2.0 * _WM_MAX / (1 << z)
    ox = -_WM_MAX + x * scale
    oy = _WM_MAX - y * scale  # tile top in mercator y

    def px(lon: float, lat: float) -> tuple[int, int]:
        mx, my = geo.web_mercator(lon, min(max(lat, -85.051128), 85.051128))
        return (
            int(round((mx - ox) / scale * EXTENT)),
            int(round((oy - my) / scale * EXTENT)),
        )

    name = g["type"]
    if name == "Point":
        return [[px(*g["coordinates"])]], 1
    if name == "MultiPoint":
        return [[px(*p)] for p in g["coordinates"]], 1
    if name == "LineString":
        return [[px(*p) for p in g["coordinates"]]], 2
    if name == "MultiLineString":
        return [[px(*p) for p in line] for line in g["coordinates"]], 2
    if name == "Polygon":
        rings = [[px(*p) for p in ring] for ring in g["coordinates"]]
        flags = [i == 0 for i in range(len(rings))]
        return _orient_rings(rings, flags), 3
    if name == "MultiPolygon":
        rings = [
            [px(*p) for p in ring] for poly in g["coordinates"] for ring in poly
        ]
        flags = [
            i == 0 for poly in g["coordinates"] for i in range(len(poly))
        ]
        return _orient_rings(rings, flags), 3
    raise ValueError(f"unsupported geometry {name}")


def encode_tile(
    features: list[tuple[geo.Geom, dict]], z: int, x: int, y: int, layer_name: str = "default"
) -> bytes:
    """Encode one MVT tile from (geometry, properties) pairs."""
    keys: list[str] = []
    values: list[bytes] = []
    value_index: dict[bytes, int] = {}
    feats = b""
    for fid, (g, props) in enumerate(features):
        parts, gtype = _tile_local_parts(g, z, x, y)
        cmds = _geometry_commands(parts, closed=(gtype == 3))
        if not cmds:
            continue
        tags: list[int] = []
        for k, v in props.items():
            if v is None:
                continue
            if k not in keys:
                keys.append(k)
            enc = _mvt_value(v)
            if enc not in value_index:
                value_index[enc] = len(values)
                values.append(enc)
            tags += [keys.index(k), value_index[enc]]
        body = _field(1, 0) + _varint(fid + 1)
        body += _len_field(2, b"".join(_varint(t) for t in tags))
        body += _field(3, 0) + _varint(gtype)
        body += _len_field(4, b"".join(_varint(c) for c in cmds))
        feats += _len_field(2, body)
    layer = _field(15, 0) + _varint(2)  # version
    layer += _len_field(1, layer_name.encode())
    layer += feats
    layer += b"".join(_len_field(3, k.encode()) for k in keys)
    layer += b"".join(_len_field(4, v) for v in values)
    layer += _field(5, 0) + _varint(EXTENT)
    return _len_field(3, layer)


# ---------------------------------------------------------------------------
# minimal decoder (inspection + tests)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7


def decode_tile(buf: bytes) -> dict:
    """Decode the subset of MVT this module writes (one layer)."""

    def fields(b: bytes):
        pos = 0
        while pos < len(b):
            key, pos = _read_varint(b, pos)
            num, wire = key >> 3, key & 0x7
            if wire == 0:
                val, pos = _read_varint(b, pos)
            elif wire == 1:
                val = b[pos : pos + 8]
                pos += 8
            elif wire == 2:
                ln, pos = _read_varint(b, pos)
                val = b[pos : pos + ln]
                pos += ln
            else:
                raise ValueError(f"wire {wire}")
            yield num, wire, val

    layer = next(v for n, _, v in fields(buf) if n == 3)
    out = {"keys": [], "values": [], "features": [], "name": None, "extent": None}
    for num, _, val in fields(layer):
        if num == 1:
            out["name"] = val.decode()
        elif num == 3:
            out["keys"].append(val.decode())
        elif num == 4:
            for vn, vw, vv in fields(val):
                if vn == 1:
                    out["values"].append(vv.decode())
                elif vn == 3:
                    out["values"].append(struct.unpack("<d", vv)[0])
                elif vn == 6:
                    out["values"].append((vv >> 1) ^ -(vv & 1))
                elif vn == 7:
                    out["values"].append(bool(vv))
        elif num == 5:
            out["extent"] = val
        elif num == 2:
            feat = {"tags": [], "type": None, "geometry": []}
            for fn, fw, fv in fields(val):
                if fn == 2:
                    pos = 0
                    while pos < len(fv):
                        t, pos = _read_varint(fv, pos)
                        feat["tags"].append(t)
                elif fn == 3:
                    feat["type"] = fv
                elif fn == 4:
                    pos = 0
                    raw = []
                    while pos < len(fv):
                        c, pos = _read_varint(fv, pos)
                        raw.append(c)
                    feat["geometry"] = _decode_commands(raw)
            out["features"].append(feat)
    return out


def _decode_commands(raw: list[int]) -> list[list[tuple[int, int]]]:
    parts: list[list[tuple[int, int]]] = []
    cx = cy = 0
    i = 0
    cur: list[tuple[int, int]] = []
    while i < len(raw):
        cmd, count = raw[i] & 0x7, raw[i] >> 3
        i += 1
        if cmd == 1:  # MoveTo
            if cur:
                parts.append(cur)
            cur = []
            for _ in range(count):
                dx, dy = raw[i], raw[i + 1]
                i += 2
                cx += (dx >> 1) ^ -(dx & 1)
                cy += (dy >> 1) ^ -(dy & 1)
                cur.append((cx, cy))
        elif cmd == 2:  # LineTo
            for _ in range(count):
                dx, dy = raw[i], raw[i + 1]
                i += 2
                cx += (dx >> 1) ^ -(dx & 1)
                cy += (dy >> 1) ^ -(dy & 1)
                cur.append((cx, cy))
        elif cmd == 7:  # ClosePath
            if cur:
                cur.append(cur[0])
    if cur:
        parts.append(cur)
    return parts


# ---------------------------------------------------------------------------
# the Spark job
# ---------------------------------------------------------------------------


def _tile_range_cols(bbox_col: str, z: int):
    """(x, y) tile ranges a bbox touches at zoom z — native column math."""
    n = F.lit(float(1 << z))
    lon0, lat0 = F.col(bbox_col)[0], F.col(bbox_col)[1]
    lon1, lat1 = F.col(bbox_col)[2], F.col(bbox_col)[3]

    def tx(lon):
        return F.floor((lon + 180.0) / 360.0 * n).cast("int")

    def ty(lat):
        clamped = F.greatest(F.least(lat, F.lit(85.051128)), F.lit(-85.051128))
        rad = F.radians(clamped)
        merc = F.log(F.tan(F.lit(math.pi / 4.0) + rad / 2.0))
        return F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / 2.0 * n).cast("int")

    x0 = F.greatest(tx(lon0), F.lit(0))
    x1 = F.least(tx(lon1), F.lit((1 << z) - 1))
    y0 = F.greatest(ty(lat1), F.lit(0))  # north edge → smaller y
    y1 = F.least(ty(lat0), F.lit((1 << z) - 1))
    return x0, x1, y0, y1


def build_tile_cache(
    spark: SparkSession,
    df: DataFrame,
    zooms: range,
    geom_col: str = "geom",
    bbox_col: str = "gfw_bbox",
    id_col: str | None = None,
    property_cols: list[str] | None = None,
    layer_name: str = "default",
    max_features_per_tile: int | None = None,
) -> DataFrame:
    """Produce the (z, x, y, pbf) tile DataFrame for ``zooms``."""
    if property_cols is None:
        # gfw_* system columns are excluded: gfw_geojson would embed the
        # full geometry a second time as a string attribute in every tile
        # the feature touches (the reference's tile caches ship
        # is_feature_info fields only, app/utils/fields.py:9-38)
        property_cols = [
            f.name
            for f in df.schema.fields
            if f.name not in (geom_col, bbox_col)
            and not f.name.startswith(("gfw_", "geom", "created_on", "updated_on"))
            and not isinstance(f.dataType, (T.BinaryType, T.ArrayType))
        ]
    pieces = []
    for z in zooms:
        x0, x1, y0, y1 = _tile_range_cols(bbox_col, z)
        tiles = F.flatten(
            F.transform(
                F.sequence(x0, x1),
                lambda x: F.transform(
                    F.sequence(y0, y1), lambda y: F.struct(x.alias("x"), y.alias("y"))
                ),
            )
        )
        pieces.append(
            df.select(
                F.lit(z).alias("z"),
                F.explode(tiles).alias("_t"),
                F.col(geom_col).alias("_g"),
                F.struct(*[F.col(c) for c in property_cols]).alias("_props"),
                # content-derived fallback id: monotonically_increasing_id
                # after an explode is neither per-feature nor stable across
                # retries, which would break the deterministic density cap
                *(
                    [F.col(id_col).alias("_fid")]
                    if id_col
                    else [F.xxhash64(F.col(geom_col)).alias("_fid")]
                ),
            ).select("z", F.col("_t.x").alias("x"), F.col("_t.y").alias("y"), "_g", "_props", "_fid")
        )
    exploded = pieces[0]
    for p in pieces[1:]:
        exploded = exploded.unionByName(p)

    if max_features_per_tile is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("z", "x", "y").orderBy(
            F.xxhash64("_fid", "z", "x", "y"), "_fid"
        )
        exploded = (
            exploded.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= max_features_per_tile)
            .drop("_rk")
        )

    prop_names = property_cols
    out_schema = T.StructType(
        [
            T.StructField("z", T.IntegerType()),
            T.StructField("x", T.IntegerType()),
            T.StructField("y", T.IntegerType()),
            T.StructField("pbf", T.BinaryType()),
            T.StructField("n_features", T.IntegerType()),
        ]
    )

    def encode(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = int(key[0]), int(key[1]), int(key[2])
        # clip to the tile + a 1/16-tile buffer (standard MVT overzoom
        # pad). The pad is applied in FRACTIONAL TILE coordinates — i.e.
        # uniformly in mercator space — because a fixed pad in degrees of
        # latitude blows up near the poles where mercator diverges.
        n = float(1 << z)
        pad = 1.0 / 16.0

        def lon_of(tx: float) -> float:
            return tx / n * 360.0 - 180.0

        def lat_of(ty: float) -> float:
            merc = math.pi * (1.0 - 2.0 * ty / n)
            return math.degrees(2.0 * math.atan(math.exp(merc)) - math.pi / 2.0)

        lon_lo, lon_hi = lon_of(x - pad), lon_of(x + 1 + pad)
        lat_hi, lat_lo = lat_of(y - pad), lat_of(y + 1 + pad)
        feats = []
        for _, row in pdf.sort_values("_fid").iterrows():
            if row["_g"] is None:
                continue
            g = geo.wkb_loads(bytes(row["_g"]))
            clipped = geo.clip_to_box(g, lon_lo, lat_lo, lon_hi, lat_hi)
            if clipped is None:
                continue
            props = {k: row["_props"][k] for k in prop_names}
            feats.append((clipped, props))
        if not feats:
            return pd.DataFrame(columns=["z", "x", "y", "pbf", "n_features"])
        blob = encode_tile(feats, z, x, y, layer_name)
        return pd.DataFrame(
            [{"z": z, "x": x, "y": y, "pbf": blob, "n_features": len(feats)}]
        )

    return exploded.groupBy("z", "x", "y").applyInPandas(encode, out_schema)


def write_tile_cache(tiles: DataFrame, path: str) -> None:
    """z/x-partitioned parquet of pbf blobs — a tile server's layout."""
    tiles.write.mode("overwrite").partitionBy("z", "x").parquet(path)
