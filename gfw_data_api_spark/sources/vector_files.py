"""Pure-Python distributed readers for GeoPackage and ESRI Shapefile —
the two binary vector formats the reference loads through ogr2ogr
(creation-option drivers GPKG / "ESRI Shapefile",
app/models/enum/creation_options.py:15-23; load job
batch/scripts/load_vector_data.sh). No GDAL in this environment, so the
formats are parsed directly from their public specs:

- GeoPackage = SQLite + the ``gpkg_geometry_columns`` registry + a
  GeoPackageBinary geometry blob (magic ``GP``, flags byte giving an
  optional envelope, then ordinary WKB) — OGC 12-128r15.
- Shapefile = fixed-header .shp with variable-length records, .shx
  sidecar holding fixed 8-byte (offset, length) index records, .dbf
  (dBASE III) attributes — the public ESRI whitepaper layout.

Scale design: the DRIVER reads only metadata (sqlite row count / the
.shx index); records are fetched inside ``mapInPandas`` over a
DataFrame of (start, end) ranges, so N partitions read concurrently
and no geometry bytes ever pass through the driver. Each worker opens
the file itself (sqlite rowid-range query / byte-range seek) — the
same pattern a cloud deployment uses against ranged S3 GETs.
"""

from __future__ import annotations

import math
import os
import sqlite3
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfw_data_api_spark.functions import geometry as geo

# --------------------------------------------------------------------------
# GeoPackage
# --------------------------------------------------------------------------


def _gpkg_parse_geometry(blob: bytes) -> bytes | None:
    """GeoPackageBinary → plain WKB (strip the GP header + envelope)."""
    if blob is None or len(blob) < 8 or blob[:2] != b"GP":
        return None
    flags = blob[3]
    if flags & 0b00100000:  # empty-geometry flag
        return None
    envelope_code = (flags >> 1) & 0b111
    envelope_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}.get(envelope_code)
    if envelope_len is None:
        return None
    return bytes(blob[8 + envelope_len :])


def gpkg_layers(path: str) -> list[str]:
    con = sqlite3.connect(path)
    try:
        rows = con.execute("SELECT table_name FROM gpkg_geometry_columns").fetchall()
        return [r[0] for r in rows]
    finally:
        con.close()


def read_geopackage(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    target_partitions: int | None = None,
) -> DataFrame:
    """E6: read one GeoPackage layer into (properties..., geom WKB).

    Driver touches metadata only: the layer's geometry column name, the
    attribute schema from SQLite's column declarations, and max(rowid).
    Workers each query one rowid range.
    """
    path = os.path.abspath(path)
    con = sqlite3.connect(path)
    try:
        if layer is None:
            layers = gpkg_layers(path)
            if len(layers) != 1:
                raise ValueError(f"specify layer= (found {layers})")
            layer = layers[0]
        geom_col_row = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns WHERE table_name = ?", (layer,)
        ).fetchone()
        if geom_col_row is None:
            raise ValueError(f"layer {layer!r} not in gpkg_geometry_columns")
        geom_col = geom_col_row[0]
        cols = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        max_rowid = con.execute(f'SELECT max(rowid) FROM "{layer}"').fetchone()[0] or 0
    finally:
        con.close()

    def spark_type(decl: str) -> T.DataType:
        decl = (decl or "").upper()
        if any(k in decl for k in ("INT",)):
            return T.LongType()
        if any(k in decl for k in ("REAL", "FLOA", "DOUB")):
            return T.DoubleType()
        if "BLOB" in decl:
            return T.BinaryType()
        if any(k in decl for k in ("DATE", "TIME")):
            return T.StringType()
        return T.StringType()

    prop_cols = [(name, spark_type(decl)) for _, name, decl, *_ in cols if name != geom_col]
    schema = T.StructType(
        [T.StructField(n, t, True) for n, t in prop_cols]
        + [T.StructField("geom", T.BinaryType(), True)]
    )
    prop_names = [n for n, _ in prop_cols]

    n_parts = target_partitions or spark.sparkContext.defaultParallelism
    step = max(1, math.ceil(max_rowid / n_parts))
    ranges = [(lo, min(lo + step - 1, max_rowid)) for lo in range(1, max_rowid + 1, step)]
    ranges_df = spark.createDataFrame(ranges or [(1, 0)], "lo long, hi long").repartition(
        max(len(ranges), 1)
    )
    select_cols = ", ".join([f'"{n}"' for n in prop_names] + [f'"{geom_col}"'])

    def fetch(batches):
        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                wcon = sqlite3.connect(path)
                try:
                    rows = wcon.execute(
                        f'SELECT {select_cols} FROM "{layer}" WHERE rowid BETWEEN ? AND ?',
                        (int(lo), int(hi)),
                    ).fetchall()
                finally:
                    wcon.close()
                if not rows:
                    continue
                data = {n: [r[i] for r in rows] for i, n in enumerate(prop_names)}
                data["geom"] = [_gpkg_parse_geometry(r[-1]) for r in rows]
                yield pd.DataFrame(data, columns=prop_names + ["geom"])

    return ranges_df.mapInPandas(fetch, schema=schema)


# --------------------------------------------------------------------------
# Shapefile
# --------------------------------------------------------------------------

_SHP_POINT = 1
_SHP_POLYLINE = 3
_SHP_POLYGON = 5


def _shp_record_geometry(buf: bytes) -> geo.Geom | None:
    """One .shp record body (little-endian after the 4-byte type)."""
    (shape_type,) = struct.unpack_from("<i", buf, 0)
    if shape_type == 0:
        return None
    if shape_type == _SHP_POINT:
        x, y = struct.unpack_from("<2d", buf, 4)
        return {"type": "Point", "coordinates": [x, y]}
    if shape_type in (_SHP_POLYLINE, _SHP_POLYGON):
        num_parts, num_points = struct.unpack_from("<2i", buf, 36)
        parts = list(struct.unpack_from(f"<{num_parts}i", buf, 44))
        pts_off = 44 + 4 * num_parts
        flat = struct.unpack_from(f"<{2 * num_points}d", buf, pts_off)
        points = [[flat[2 * i], flat[2 * i + 1]] for i in range(num_points)]
        rings = [
            points[parts[i] : (parts[i + 1] if i + 1 < num_parts else num_points)]
            for i in range(num_parts)
        ]
        if shape_type == _SHP_POLYLINE:
            if len(rings) == 1:
                return {"type": "LineString", "coordinates": rings[0]}
            return {"type": "MultiLineString", "coordinates": rings}
        return _esri_rings_to_geom(rings)
    raise ValueError(f"unsupported shape type {shape_type}")


def _esri_rings_to_geom(rings: list[list]) -> geo.Geom:
    """ESRI ring convention (shared by Shapefile and ESRIJSON): outer
    rings clockwise, holes counter-clockwise; holes attach to the
    preceding outer ring."""
    polys: list[list] = []
    for ring in rings:
        area = sum(
            (ring[i][0] * ring[i + 1][1] - ring[i + 1][0] * ring[i][1])
            for i in range(len(ring) - 1)
        )
        is_outer = area < 0  # shoelace: CW (ESRI outer) is negative
        if is_outer or not polys:
            polys.append([ring])
        else:
            polys[-1].append(ring)
    if len(polys) == 1:
        return {"type": "Polygon", "coordinates": polys[0]}
    return {"type": "MultiPolygon", "coordinates": polys}


def _dbf_fields(path: str) -> tuple[list[tuple[str, str, int, int]], int, int, int]:
    """dBASE III header: field descriptors + record layout."""
    with open(path, "rb") as fh:
        head = fh.read(32)
        n_records, header_len, record_len = struct.unpack_from("<IHH", head, 4)
        fields = []
        pos = 32
        while pos < header_len - 1:
            fh.seek(pos)
            desc = fh.read(32)
            if desc[0:1] == b"\r":
                break
            name = desc[:11].split(b"\x00")[0].decode("ascii", "replace")
            ftype = desc[11:12].decode("ascii")
            flen = desc[16]
            fdec = desc[17]
            fields.append((name, ftype, flen, fdec))
            pos += 32
    return fields, n_records, header_len, record_len


def _dbf_value(raw: bytes, ftype: str, fdec: int):
    text = raw.decode("latin-1").strip()
    if not text:
        return None
    if ftype == "N":
        return float(text) if (fdec > 0 or "." in text) else int(text)
    if ftype == "F":
        return float(text)
    if ftype == "L":
        return text in "YyTt"
    return text


def read_shapefile(
    spark: SparkSession,
    shp_path: str,
    target_partitions: int | None = None,
) -> DataFrame:
    """E6: read a .shp/.shx/.dbf triple into (properties..., geom WKB).

    The .shx sidecar gives every record's (offset, length) in fixed
    8-byte entries — the driver reads ONLY that index (8 bytes/record)
    and ships record-number ranges; workers seek directly to their
    slice of .shp and .dbf (fixed record length).
    """
    shp_path = os.path.abspath(shp_path)
    base = shp_path[:-4]
    shx_path, dbf_path = base + ".shx", base + ".dbf"
    with open(shx_path, "rb") as fh:
        shx = fh.read()
    n_records = (len(shx) - 100) // 8
    offsets = [
        struct.unpack_from(">2i", shx, 100 + 8 * i) for i in range(n_records)
    ]  # (offset_words, length_words), big-endian 16-bit words

    fields, dbf_n, dbf_header_len, dbf_record_len = _dbf_fields(dbf_path)
    if dbf_n != n_records:
        raise ValueError(f".dbf has {dbf_n} records, .shx has {n_records}")

    def spark_type(ftype: str, fdec: int) -> T.DataType:
        if ftype == "N":
            return T.DoubleType() if fdec > 0 else T.LongType()
        if ftype == "F":
            return T.DoubleType()
        if ftype == "L":
            return T.BooleanType()
        return T.StringType()

    schema = T.StructType(
        [T.StructField(n, spark_type(t, d), True) for n, t, _, d in fields]
        + [T.StructField("geom", T.BinaryType(), True)]
    )
    field_meta = [(n, t, length, d) for n, t, length, d in fields]

    n_parts = target_partitions or spark.sparkContext.defaultParallelism
    step = max(1, math.ceil(n_records / n_parts)) if n_records else 1
    # each row carries ITS slice of the .shx index — capturing the whole
    # offsets list in the closure would ship the full per-record index
    # (8 bytes × N records) to every task
    ranges = [
        (i, min(i + step, n_records), [list(o) for o in offsets[i : min(i + step, n_records)]])
        for i in range(0, n_records, step)
    ]
    ranges_df = spark.createDataFrame(
        ranges or [(0, 0, [])], "lo long, hi long, index array<array<int>>"
    ).repartition(max(len(ranges), 1))

    def fetch(batches):
        for pdf in batches:
            for lo, hi, index in zip(pdf["lo"], pdf["hi"], pdf["index"]):
                lo, hi = int(lo), int(hi)
                if hi <= lo:
                    continue
                rows = []
                with open(shp_path, "rb") as shp, open(dbf_path, "rb") as dbf:
                    for rec in range(lo, hi):
                        off_words, len_words = index[rec - lo]
                        shp.seek(off_words * 2 + 8)  # skip record header
                        body = shp.read(len_words * 2)
                        g = _shp_record_geometry(body)
                        dbf.seek(dbf_header_len + rec * dbf_record_len)
                        raw = dbf.read(dbf_record_len)
                        row: dict = {}
                        pos = 1  # deletion-flag byte
                        for name, ftype, flen, fdec in field_meta:
                            row[name] = _dbf_value(raw[pos : pos + flen], ftype, fdec)
                            pos += flen
                        row["geom"] = None if g is None else geo.wkb_dumps(g)
                        rows.append(row)
                yield pd.DataFrame(rows, columns=[f[0] for f in field_meta] + ["geom"])

    return ranges_df.mapInPandas(fetch, schema=schema)


# --------------------------------------------------------------------------
# ESRIJSON
# --------------------------------------------------------------------------


def _esrijson_geometry(g: dict | None) -> geo.Geom | None:
    if not g:
        return None
    if "x" in g and "y" in g:
        return {"type": "Point", "coordinates": [g["x"], g["y"]]}
    if "points" in g:
        return {"type": "MultiPoint", "coordinates": [list(p) for p in g["points"]]}
    if "paths" in g:
        paths = [[list(p) for p in path] for path in g["paths"]]
        if len(paths) == 1:
            return {"type": "LineString", "coordinates": paths[0]}
        return {"type": "MultiLineString", "coordinates": paths}
    if "rings" in g:
        return _esri_rings_to_geom([[list(p) for p in r] for r in g["rings"]])
    return None


def read_esrijson(spark: SparkSession, path: str) -> DataFrame:
    """E6: ESRIJSON FeatureSet (ArcGIS REST export) → (attributes...,
    geom WKB). Driver-side parse like read_feature_collection — ESRIJSON
    arrives as single API responses, not bulk files; bulk loads use the
    GeoJSONSeq / GPKG / Shapefile paths."""
    import json

    with open(path) as fh:
        doc = json.load(fh)
    features = doc.get("features", [])

    def field_type(esri: str) -> T.DataType:
        if esri in ("esriFieldTypeInteger", "esriFieldTypeSmallInteger", "esriFieldTypeOID"):
            return T.LongType()
        if esri in ("esriFieldTypeDouble", "esriFieldTypeSingle"):
            return T.DoubleType()
        return T.StringType()

    declared = doc.get("fields") or []
    if declared:
        prop_fields = [(f["name"], field_type(f.get("type", ""))) for f in declared]
    else:  # infer from the first feature's attributes
        attrs = features[0].get("attributes", {}) if features else {}
        prop_fields = [
            (
                k,
                T.LongType()
                if isinstance(v, int) and not isinstance(v, bool)
                else T.DoubleType()
                if isinstance(v, float)
                else T.StringType(),
            )
            for k, v in attrs.items()
        ]
    schema = T.StructType(
        [T.StructField(n, t, True) for n, t in prop_fields]
        + [T.StructField("geom", T.BinaryType(), True)]
    )
    rows = []
    for feat in features:
        attrs = feat.get("attributes") or {}
        row = [attrs.get(n) for n, _ in prop_fields]
        g = _esrijson_geometry(feat.get("geometry"))
        row.append(bytearray(geo.wkb_dumps(g)) if g else None)
        rows.append(row)
    return spark.createDataFrame(rows, schema)


# --------------------------------------------------------------------------
# writers (test fixtures + E12 export symmetry)
# --------------------------------------------------------------------------


def write_geopackage(df: DataFrame, path: str, layer: str, geom_col: str = "geom") -> None:
    """Collect + write a (small) DataFrame as a valid GeoPackage layer.
    Export-path symmetry for E12 (the reference ships ogr2ogr exports);
    collect is deliberate — exports of query results are driver-sized,
    and capped: oversized exports belong on the distributed
    export_ndjson_features path."""
    from gfw_data_api_spark.operators.downloads import _guard_collect

    rows = _guard_collect(df, "write_geopackage", "export_ndjson_features")
    prop_fields = [f for f in df.schema.fields if f.name != geom_col]
    con = sqlite3.connect(path)
    try:
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents (table_name TEXT PRIMARY KEY, "
            "data_type TEXT, identifier TEXT, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (table_name TEXT, "
            "column_name TEXT, geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)"
        )

        def sql_type(t: T.DataType) -> str:
            if isinstance(t, (T.LongType, T.IntegerType, T.ShortType, T.BooleanType)):
                return "INTEGER"
            if isinstance(t, (T.DoubleType, T.FloatType)):
                return "REAL"
            if isinstance(t, T.BinaryType):
                return "BLOB"
            return "TEXT"

        cols_sql = ", ".join(f'"{f.name}" {sql_type(f.dataType)}' for f in prop_fields)
        con.execute(f'CREATE TABLE "{layer}" ({cols_sql}, "{geom_col}" BLOB)')
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents VALUES (?, 'features', ?, 4326)",
            (layer, layer),
        )
        con.execute(
            "INSERT INTO gpkg_geometry_columns VALUES (?, ?, 'GEOMETRY', 4326, 0, 0)",
            (layer, geom_col),
        )
        placeholders = ", ".join("?" for _ in range(len(prop_fields) + 1))
        for row in rows:
            vals = [row[f.name] for f in prop_fields]
            wkb = row[geom_col]
            blob = None
            if wkb is not None:
                # GP header: magic, version 0, flags: little-endian byte
                # order bit only (no envelope)
                blob = b"GP\x00\x01" + struct.pack("<i", 4326) + bytes(wkb)
            con.execute(f'INSERT INTO "{layer}" VALUES ({placeholders})', (*vals, blob))
        con.commit()
    finally:
        con.close()


# ---------------------------------------------------------------------------
# ESRI FileGDB (reference driver enum creation_options.py:15-23)
#
# Pure-Python OpenFileGDB-subset codec. The .gdbtable format is
# ESRI-proprietary but publicly reverse-engineered (Even Rouault's "FGDB
# Spec", the layout GDAL's OpenFileGDB driver implements). This reads the
# common subset the reference's vector loads need: V3 tables, field types
# objectid / int16 / int32 / float32 / float64 / string / datetime /
# geometry, shapes point / polyline / polygon — including their z/m
# variants (codes 9/11/13/15/21/23/25), whose elevation/measure streams
# are parsed past and flattened to 2-D. Anything outside the subset
# (compressed tables, blob/raster/uuid fields, multipatch) raises
# FileGDBUnsupportedError with the ogr2ogr conversion hint instead of
# decoding garbage.
#
# Scale design (same as read_shapefile): the DRIVER reads only the
# .gdbtablx row index (5-6 bytes/row) plus the ~hundreds-of-bytes field
# descriptor; row blobs are decoded inside mapInPandas over ranges of
# row offsets, so N partitions seek-and-parse concurrently and no
# feature bytes pass through the driver.
# ---------------------------------------------------------------------------


class FileGDBUnsupportedError(NotImplementedError):
    """Raised for a STRUCTURALLY VALID .gdb whose row data this
    environment cannot decode."""


def _read_varuint(buf: bytes, pos: int) -> tuple[int, int]:
    """LEB128 unsigned varint (FGDB row/geometry encoding)."""
    shift = 0
    val = 0
    while True:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, pos
        shift += 7


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """FGDB signed varint: sign bit is bit 6 of the FIRST byte; the
    magnitude packs 6 bits from byte 0 then 7 bits per continuation."""
    b = buf[pos]
    pos += 1
    negative = bool(b & 0x40)
    val = b & 0x3F
    shift = 6
    while b & 0x80:
        b = buf[pos]
        pos += 1
        val |= (b & 0x7F) << shift
        shift += 7
    return (-val if negative else val), pos


def _write_varuint(val: int) -> bytes:
    out = bytearray()
    while True:
        b = val & 0x7F
        val >>= 7
        if val:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _write_varint(val: int) -> bytes:
    negative = val < 0
    val = -val if negative else val
    first = (val & 0x3F) | (0x40 if negative else 0)
    val >>= 6
    out = bytearray()
    if val:
        out.append(first | 0x80)
        while True:
            b = val & 0x7F
            val >>= 7
            if val:
                out.append(b | 0x80)
            else:
                out.append(b)
                break
    else:
        out.append(first)
    return bytes(out)


# field type codes (FGDB Spec §field description)
_GDB_INT16, _GDB_INT32, _GDB_FLOAT32, _GDB_FLOAT64 = 0, 1, 2, 3
_GDB_STRING, _GDB_DATETIME, _GDB_OBJECTID, _GDB_GEOMETRY = 4, 5, 6, 7


def _gdbtablx_offsets(path: str) -> list[int]:
    """Row offsets from the .gdbtablx sidecar: 16-byte header
    (magic=3, n 1024-blocks, n rows, offset width), then fixed-width
    little-endian offsets; 0 = deleted/absent row."""
    with open(path, "rb") as fh:
        head = fh.read(16)
        magic, _blocks, n_rows, width = struct.unpack("<4i", head)
        if magic != 3:
            raise FileGDBUnsupportedError(f"{path}: .gdbtablx magic {magic} != 3")
        if width not in (4, 5, 6):
            raise FileGDBUnsupportedError(f"{path}: offset width {width} unsupported")
        raw = fh.read(n_rows * width)
    return [
        int.from_bytes(raw[i * width : (i + 1) * width], "little")
        for i in range(n_rows)
    ]


def _gdbtable_schema(path: str) -> dict:
    """Parse the .gdbtable 40-byte header + field descriptor section.

    Returns {"n_rows", "fields": [(name, type_code, nullable)],
    "geom": {xorigin, yorigin, xyscale} | None}.
    """
    with open(path, "rb") as fh:
        head = fh.read(40)
        if len(head) < 40 or struct.unpack_from("<i", head, 0)[0] != 3:
            raise FileGDBUnsupportedError(f"{path}: bad .gdbtable magic")
        n_rows = struct.unpack_from("<i", head, 4)[0]
        field_off = struct.unpack_from("<q", head, 32)[0]
        fh.seek(field_off)
        # generous read: descriptor sections are tiny (≤ a few KB)
        sec = fh.read(1 << 20)

    pos = 0
    _sec_len, version = struct.unpack_from("<2i", sec, pos)
    pos += 8
    if version not in (3, 4):
        raise FileGDBUnsupportedError(f"{path}: field-section version {version}")
    _layer_geom_type = sec[pos]
    pos += 4  # geometry-type byte + 3 flag bytes
    (n_fields,) = struct.unpack_from("<h", sec, pos)
    pos += 2

    fields: list[tuple[str, int, bool]] = []
    geom_params = None
    for _ in range(n_fields):
        name_chars = sec[pos]
        pos += 1
        name = sec[pos : pos + 2 * name_chars].decode("utf-16-le")
        pos += 2 * name_chars
        alias_chars = sec[pos]
        pos += 1
        pos += 2 * alias_chars
        ftype = sec[pos]
        pos += 1
        nullable = True
        if ftype == _GDB_OBJECTID:
            pos += 2  # unknown bytes (4, 2)
            nullable = False
        elif ftype in (_GDB_INT16, _GDB_INT32, _GDB_FLOAT32, _GDB_FLOAT64, _GDB_DATETIME):
            _width = sec[pos]
            flags = sec[pos + 1]
            pos += 2
            nullable = bool(flags & 1)
            if flags & 4:  # default value: length byte + payload
                dlen = sec[pos]
                pos += 1 + dlen
        elif ftype == _GDB_STRING:
            pos += 4  # int32 max length
            flags = sec[pos]
            pos += 1
            nullable = bool(flags & 1)
            if flags & 4:
                dlen, pos = _read_varuint(sec, pos)
                pos += dlen
        elif ftype == _GDB_GEOMETRY:
            pos += 1  # unknown (0)
            flags = sec[pos]
            pos += 1
            nullable = bool(flags & 1)
            (wkt_len,) = struct.unpack_from("<h", sec, pos)
            pos += 2 + wkt_len  # UTF-16 SRS WKT, wkt_len in BYTES
            geom_flags = sec[pos]
            pos += 1
            has_z = bool(geom_flags & 4)
            has_m = bool(geom_flags & 2)
            xorigin, yorigin, xyscale = struct.unpack_from("<3d", sec, pos)
            pos += 24
            # FGDB-Spec descriptor order: m params before z params, both
            # before xytolerance; tolerances in the same m-then-z order
            if has_m:
                pos += 16  # morigin, mscale
            if has_z:
                pos += 16  # zorigin, zscale
            pos += 8  # xytolerance
            if has_m:
                pos += 8  # mtolerance
            if has_z:
                pos += 8  # ztolerance
            geom_params = {"xorigin": xorigin, "yorigin": yorigin, "xyscale": xyscale}
            pos += 32  # extent: xmin, ymin, xmax, ymax
            # spatial-grid-size section (FGDB-Spec): 1-byte count of
            # float64 grid sizes, then count*8 bytes. Real ESRI GDBs
            # order fields OBJECTID, SHAPE, attributes — skipping this
            # section would misalign every attribute descriptor that
            # follows SHAPE (garbage schema / spurious rejects).
            n_grids = sec[pos]
            pos += 1
            if n_grids > 16 or pos + 8 * n_grids > len(sec):
                raise FileGDBUnsupportedError(
                    f"{path}: implausible spatial-grid count {n_grids} in "
                    "geometry field descriptor"
                )
            pos += 8 * n_grids
        else:
            raise FileGDBUnsupportedError(
                f"{path}: field {name!r} type {ftype} outside the supported subset"
            )
        fields.append((name, ftype, nullable))
    return {"n_rows": n_rows, "fields": fields, "geom": geom_params}


def _gdb_decode_geometry(blob: bytes, params: dict) -> geo.Geom | None:
    """FGDB geometry blob → GeoJSON-style dict (point/polyline/polygon).

    Coordinates are stored as scaled integers: points as
    ``(v - 1) / xyscale + origin`` (0 reserved for empty), line/ring
    vertices as cumulative signed-varint deltas in integer space then
    ``v / xyscale + origin``.
    """
    xs, ys, scale = params["xorigin"], params["yorigin"], params["xyscale"]
    gtype, pos = _read_varuint(blob, 0)
    # z/m-bearing shape codes flatten to their 2-D base type: the z/m
    # streams sit AFTER the xy data in every blob layout (point: trailing
    # varuints; line/ring: trailing delta streams) and each geometry blob
    # is length-prefixed in the row, so dropping them needs no byte
    # accounting. 2.5D sources therefore load with geometries flattened
    # to 2-D — matching how the reference's 2-D web-mercator pipeline
    # treats elevation (it never reaches the served tiles).
    # Esri extended shape codes: z-only (9/10/19), zm (11/13/15) and
    # m-only (21/23/25) all flatten to the 2-D base (1/3/5).
    shape = {9: 1, 11: 1, 21: 1, 10: 3, 13: 3, 23: 3, 19: 5, 15: 5, 25: 5}.get(
        gtype & 0xFF, gtype & 0xFF
    )
    if shape == 1:  # point
        vx, pos = _read_varuint(blob, pos)
        if vx == 0:
            return None
        vy, pos = _read_varuint(blob, pos)
        return {
            "type": "Point",
            "coordinates": [(vx - 1) / scale + xs, (vy - 1) / scale + ys],
        }
    if shape in (3, 5):  # polyline / polygon
        npoints, pos = _read_varuint(blob, pos)
        if npoints == 0:
            return None
        nparts, pos = _read_varuint(blob, pos)
        for _ in range(4):  # scaled bbox (xmin, ymin, dx, dy) — unused
            _, pos = _read_varuint(blob, pos)
        counts = []
        for _ in range(max(nparts - 1, 0)):
            c, pos = _read_varuint(blob, pos)
            counts.append(c)
        counts.append(npoints - sum(counts))
        parts: list[list] = []
        ix = iy = 0
        for count in counts:
            part = []
            for _ in range(count):
                dx, pos = _read_varint(blob, pos)
                dy, pos = _read_varint(blob, pos)
                ix += dx
                iy += dy
                part.append([ix / scale + xs, iy / scale + ys])
            parts.append(part)
        if shape == 3:
            if len(parts) == 1:
                return {"type": "LineString", "coordinates": parts[0]}
            return {"type": "MultiLineString", "coordinates": parts}
        return _esri_rings_to_geom(parts)
    raise FileGDBUnsupportedError(f"geometry shape type {shape} unsupported")


def _gdb_decode_row(blob: bytes, fields: list, geom_params: dict | None) -> dict:
    """One row blob (the bytes after the int32 length): null bitmap over
    nullable fields (LSB-first, bit set = NULL), then values in field
    order; objectid is implicit and never stored."""
    nullable = [f for f in fields if f[2] and f[1] != _GDB_OBJECTID]
    bitmap_len = (len(nullable) + 7) // 8
    bitmap = blob[:bitmap_len]
    pos = bitmap_len
    row: dict = {}
    null_idx = 0
    for name, ftype, is_nullable in fields:
        if ftype == _GDB_OBJECTID:
            continue
        if is_nullable:
            is_null = bool(bitmap[null_idx // 8] & (1 << (null_idx % 8)))
            null_idx += 1
            if is_null:
                row[name] = None
                continue
        if ftype == _GDB_INT16:
            (row[name],) = struct.unpack_from("<h", blob, pos)
            pos += 2
        elif ftype == _GDB_INT32:
            (row[name],) = struct.unpack_from("<i", blob, pos)
            pos += 4
        elif ftype == _GDB_FLOAT32:
            (row[name],) = struct.unpack_from("<f", blob, pos)
            pos += 4
        elif ftype == _GDB_FLOAT64:
            (row[name],) = struct.unpack_from("<d", blob, pos)
            pos += 8
        elif ftype == _GDB_DATETIME:
            (days,) = struct.unpack_from("<d", blob, pos)
            pos += 8
            import datetime as _dt

            row[name] = _dt.datetime(1899, 12, 30) + _dt.timedelta(days=days)
        elif ftype == _GDB_STRING:
            ln, pos = _read_varuint(blob, pos)
            row[name] = blob[pos : pos + ln].decode("utf-8")
            pos += ln
        elif ftype == _GDB_GEOMETRY:
            ln, pos = _read_varuint(blob, pos)
            g = _gdb_decode_geometry(blob[pos : pos + ln], geom_params)
            pos += ln
            row["geom"] = None if g is None else geo.wkb_dumps(g)
        else:  # pragma: no cover — rejected at schema parse
            raise FileGDBUnsupportedError(f"field type {ftype}")
    return row


def inspect_file_gdb(path: str) -> dict:
    """Validate + describe an ESRI FileGDB directory.

    A FileGDB is a directory of ``aXXXXXXXX.gdbtable`` files;
    ``a00000001.gdbtable`` is the GDB_SystemCatalog that names the rest
    (OpenFileGDB reverse-engineered layout). Returns
    ``{"path", "n_tables", "table_files"}`` or raises ``ValueError``
    when ``path`` is not a FileGDB at all.
    """
    import os as _os

    if not _os.path.isdir(path):
        raise ValueError(f"{path!r} is not a FileGDB: not a directory")
    tables = sorted(
        f for f in _os.listdir(path)
        if f.startswith("a") and f.endswith(".gdbtable")
    )
    if "a00000001.gdbtable" not in tables:
        raise ValueError(
            f"{path!r} is not a FileGDB: missing the GDB_SystemCatalog "
            "(a00000001.gdbtable)"
        )
    return {"path": path, "n_tables": len(tables), "table_files": tables}


def _gdb_read_table_rows(table_path: str) -> list[dict]:
    """Driver-side full read of ONE system table (the catalog — tiny)."""
    schema = _gdbtable_schema(table_path)
    offsets = _gdbtablx_offsets(table_path[: -len(".gdbtable")] + ".gdbtablx")
    rows = []
    with open(table_path, "rb") as fh:
        for oid, off in enumerate(offsets, start=1):
            if off == 0:
                continue
            fh.seek(off)
            (blob_len,) = struct.unpack("<i", fh.read(4))
            blob = fh.read(blob_len)
            row = _gdb_decode_row(blob, schema["fields"], schema["geom"])
            row["_oid"] = oid
            rows.append(row)
    return rows


def file_gdb_layers(path: str) -> dict[str, str]:
    """Layer name → .gdbtable file, from the GDB_SystemCatalog
    (a00000001.gdbtable): catalog row N describes table file
    ``a{N:08x}.gdbtable``; GDB_*-prefixed names are system tables."""
    inspect_file_gdb(path)
    catalog = _gdb_read_table_rows(os.path.join(path, "a00000001.gdbtable"))
    out = {}
    for row in catalog:
        name = row.get("Name")
        if not name or name.startswith("GDB_"):
            continue
        table_file = os.path.join(path, f"a{row['_oid']:08x}.gdbtable")
        if os.path.exists(table_file):
            out[name] = table_file
    return out


def read_file_gdb(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    target_partitions: int | None = None,
) -> DataFrame:
    """E6: read one ESRI FileGDB layer into (attributes..., geom WKB).

    Reference accepts FileGDB via GDAL's OpenFileGDB
    (app/models/enum/creation_options.py:15-23, loader
    batch/scripts/load_vector_data.sh); this is a pure-Python port of
    the publicly documented subset (see module section comment). The
    driver reads only the .gdbtablx row index and the field descriptor;
    workers seek to their rows inside ``mapInPandas``. GDBs outside the
    subset raise ``FileGDBUnsupportedError`` with a conversion hint.
    """
    path = os.path.abspath(path)
    layers = file_gdb_layers(path)
    if layer is None:
        if len(layers) != 1:
            raise ValueError(f"specify layer= (found {sorted(layers)})")
        layer = next(iter(layers))
    if layer not in layers:
        raise ValueError(f"layer {layer!r} not in {sorted(layers)}")
    table_path = layers[layer]
    tablx_path = table_path[: -len(".gdbtable")] + ".gdbtablx"
    table_schema = _gdbtable_schema(table_path)
    fields = table_schema["fields"]
    geom_params = table_schema["geom"]
    offsets = _gdbtablx_offsets(tablx_path)

    def spark_type(ftype: int) -> T.DataType:
        return {
            _GDB_INT16: T.IntegerType(),
            _GDB_INT32: T.IntegerType(),
            _GDB_FLOAT32: T.FloatType(),
            _GDB_FLOAT64: T.DoubleType(),
            _GDB_DATETIME: T.TimestampType(),
            _GDB_STRING: T.StringType(),
        }[ftype]

    out_fields = [T.StructField("objectid", T.LongType(), False)]
    colnames = ["objectid"]
    for name, ftype, _null in fields:
        if ftype == _GDB_OBJECTID:
            continue
        if ftype == _GDB_GEOMETRY:
            out_fields.append(T.StructField("geom", T.BinaryType(), True))
            colnames.append("geom")
        else:
            out_fields.append(T.StructField(name, spark_type(ftype), True))
            colnames.append(name)
    schema = T.StructType(out_fields)

    live = [(oid, off) for oid, off in enumerate(offsets, start=1) if off != 0]
    n_parts = target_partitions or spark.sparkContext.defaultParallelism
    step = max(1, math.ceil(len(live) / n_parts)) if live else 1
    # each range row carries ITS slice of the offset index (same reason
    # as read_shapefile: don't closure-capture the whole index)
    ranges = [
        (i, [[oid, off] for oid, off in live[i : i + step]])
        for i in range(0, len(live), step)
    ]
    ranges_df = spark.createDataFrame(
        ranges or [(0, [])], "part long, index array<array<long>>"
    ).repartition(max(len(ranges), 1))

    def fetch(batches):
        for pdf in batches:
            for index in pdf["index"]:
                if len(index) == 0:
                    continue
                rows = []
                with open(table_path, "rb") as fh:
                    for oid, off in index:
                        fh.seek(int(off))
                        (blob_len,) = struct.unpack("<i", fh.read(4))
                        blob = fh.read(blob_len)
                        row = _gdb_decode_row(blob, fields, geom_params)
                        row["objectid"] = int(oid)
                        rows.append(row)
                yield pd.DataFrame(rows, columns=colnames)

    return ranges_df.mapInPandas(fetch, schema=schema)


def write_file_gdb(
    df: DataFrame,
    path: str,
    layer: str,
    geom_col: str = "geom",
    geom_first: bool = True,
    with_z: bool = False,
    z_codes: str = "zm",
) -> None:
    """Collect + write a (small) DataFrame as a minimal valid FileGDB —
    the byte-level twin of ``read_file_gdb`` (same public FGDB-Spec
    subset), used for fixtures and E12 export symmetry. Creates the
    GDB_SystemCatalog (a00000001) and the layer table (a00000002).

    ``geom_first=True`` (default) writes the ESRI-realistic field order
    OBJECTID, SHAPE, attributes — which exercises the reader's handling
    of attribute descriptors AFTER the geometry descriptor (incl. the
    spatial-grid-size section); ``False`` keeps attributes-then-SHAPE.

    ``with_z=True`` writes a z-enabled layer (geom flag 0x04, z
    origin/scale + tolerance doubles in spec order, z-bearing shape
    codes, synthetic constant-elevation z streams) — the fixture for
    the reader's 2.5D flattening path. ``z_codes`` picks the shape-code
    family for z layers: ``"zm"`` (11/13/15, the PointZM/ArcZM/PolygonZM
    codes ArcGIS writes for z+m-enabled layers) or ``"z"`` (9/10/19, the
    z-only PointZ/ArcZ/PolygonZ codes — the common 2.5D no-M case)."""
    if z_codes not in ("zm", "z"):
        raise ValueError("z_codes must be 'zm' or 'z'")
    from gfw_data_api_spark.operators.downloads import _guard_collect

    rows = _guard_collect(df, "write_filegdb", "export_ndjson_features")
    os.makedirs(path, exist_ok=True)
    prop_fields = [f for f in df.schema.fields if f.name != geom_col]
    has_geom = any(f.name == geom_col for f in df.schema.fields)

    def field_desc(name: str, ftype: int, extra: bytes) -> bytes:
        enc = name.encode("utf-16-le")
        return bytes([len(name)]) + enc + b"\x00" + bytes([ftype]) + extra

    def scalar_type(t: T.DataType) -> int:
        if isinstance(t, (T.LongType, T.IntegerType, T.ShortType)):
            return _GDB_INT32
        if isinstance(t, (T.DoubleType,)):
            return _GDB_FLOAT64
        if isinstance(t, (T.FloatType,)):
            return _GDB_FLOAT32
        if isinstance(t, T.TimestampType):
            return _GDB_DATETIME
        if isinstance(t, T.StringType):
            return _GDB_STRING
        raise ValueError(f"unsupported export type {t}")

    _WIDTHS = {_GDB_INT32: 4, _GDB_FLOAT32: 4, _GDB_FLOAT64: 8, _GDB_DATETIME: 8}
    xyscale = 1e9  # ~1e-9 deg resolution, origin (-400, -400) like ESRI default
    xorigin = yorigin = -400.0

    zorigin, zscale = -100000.0, 1e4
    fixture_z = 7.5  # synthetic constant elevation for z fixtures

    def geometry_desc() -> bytes:
        wkt = b""  # empty SRS WKT
        z_params = struct.pack("<2d", zorigin, zscale) if with_z else b""
        z_tol = struct.pack("<d", 1.0 / zscale) if with_z else b""
        return (
            field_desc("SHAPE", _GDB_GEOMETRY, b"")
            + b"\x00\x01"  # unknown, flags: nullable
            + struct.pack("<h", len(wkt))
            + wkt
            + (b"\x04" if with_z else b"\x00")  # geom flags: z bit only
            + struct.pack("<3d", xorigin, yorigin, xyscale)
            + z_params  # spec order: (m params would precede) z params
            + struct.pack("<d", 1.0 / xyscale)  # xytolerance
            + z_tol
            + struct.pack("<4d", -180.0, -90.0, 180.0, 90.0)  # extent
            + bytes([1])  # spatial-grid-size count
            + struct.pack("<d", 4.0)  # one grid size (value unused by readers)
        )

    def encode_geometry(wkb: bytes) -> bytes:
        g = geo.wkb_loads(bytes(wkb))
        zint = round((fixture_z - zorigin) * zscale)
        if g["type"] == "Point":
            x, y = g["coordinates"]
            vx = round((x - xorigin) * xyscale) + 1
            vy = round((y - yorigin) * xyscale) + 1
            point_code = {"zm": 11, "z": 9}[z_codes] if with_z else 1
            out = _write_varuint(point_code) + _write_varuint(vx) + _write_varuint(vy)
            if with_z:
                out += _write_varuint(zint + 1)
            return out
        if g["type"] in ("LineString", "MultiLineString", "Polygon", "MultiPolygon"):
            if g["type"] == "LineString":
                parts, shape = [g["coordinates"]], 3
            elif g["type"] == "MultiLineString":
                parts, shape = g["coordinates"], 3
            elif g["type"] == "Polygon":
                parts, shape = g["coordinates"], 5
            else:
                parts, shape = [r for p in g["coordinates"] for r in p], 5
            pts = [p for part in parts for p in part]
            npoints = len(pts)
            if with_z:
                shape = {"zm": {3: 13, 5: 15}, "z": {3: 10, 5: 19}}[z_codes][shape]
            out = bytearray(_write_varuint(shape))
            out += _write_varuint(npoints)
            out += _write_varuint(len(parts))
            ixs = [round((x - xorigin) * xyscale) for x, _ in pts]
            iys = [round((y - yorigin) * xyscale) for _, y in pts]
            out += _write_varuint(min(ixs))
            out += _write_varuint(min(iys))
            out += _write_varuint(max(ixs) - min(ixs))
            out += _write_varuint(max(iys) - min(iys))
            for part in parts[:-1]:
                out += _write_varuint(len(part))
            px = py = 0
            for ix, iy in zip(ixs, iys):
                out += _write_varint(ix - px) + _write_varint(iy - py)
                px, py = ix, iy
            if with_z:
                # trailing z-delta stream: first delta from 0, then flat
                pz = 0
                for _ in range(npoints):
                    out += _write_varint(zint - pz)
                    pz = zint
            return bytes(out)
        raise ValueError(f"unsupported geometry {g['type']}")

    # ---- catalog (a00000001): ObjectID, Name string, FileFormat int32
    def catalog_fields() -> bytes:
        return (
            field_desc("ObjectID", _GDB_OBJECTID, bytes([4, 2]))
            + field_desc("Name", _GDB_STRING, struct.pack("<i", 160) + bytes([1]))
            + field_desc("FileFormat", _GDB_INT32, bytes([4, 1]))
        )

    def catalog_row(name: str) -> bytes:
        enc = name.encode("utf-8")
        # 2 nullable fields (Name, FileFormat) → 1 bitmap byte, none null
        return b"\x00" + _write_varuint(len(enc)) + enc + struct.pack("<i", 0)

    def emit(table_no: int, n_fields: int, fields_blob: bytes, row_blobs: list[bytes], geom_type: int) -> None:
        sec = struct.pack("<2i", len(fields_blob) + 6, 4)
        sec += bytes([geom_type, 3, 0, 0]) + struct.pack("<h", n_fields) + fields_blob
        table = os.path.join(path, f"a{table_no:08x}.gdbtable")
        tablx = os.path.join(path, f"a{table_no:08x}.gdbtablx")
        body = bytearray()
        offsets = []
        pos = 40
        for blob in row_blobs:
            offsets.append(pos)
            body += struct.pack("<i", len(blob)) + blob
            pos += 4 + len(blob)
        with open(table, "wb") as fh:
            fh.write(struct.pack("<6i2q", 3, len(row_blobs), 0, 0, 0, 0, pos + len(sec), pos))
            fh.write(body)
            fh.write(sec)
        n_blocks = max(1, math.ceil(max(len(offsets), 1) / 1024))
        with open(tablx, "wb") as fh:
            fh.write(struct.pack("<4i", 3, n_blocks, len(offsets), 5))
            for off in offsets:
                fh.write(off.to_bytes(5, "little"))
            fh.write(b"\x00" * 5 * (n_blocks * 1024 - len(offsets)))
            fh.write(b"\x00" * 16)

    emit(
        1,
        3,
        catalog_fields(),
        [catalog_row("GDB_SystemCatalog"), catalog_row(layer)],
        0,
    )

    # ---- layer table (a00000002)
    # ordered value columns (descriptor order == row-payload order)
    ordered: list[tuple[str, int]] = []
    if has_geom and geom_first:
        ordered.append((geom_col, _GDB_GEOMETRY))
    for f in prop_fields:
        ordered.append((f.name, scalar_type(f.dataType)))
    if has_geom and not geom_first:
        ordered.append((geom_col, _GDB_GEOMETRY))

    layer_fields = field_desc("OBJECTID", _GDB_OBJECTID, bytes([4, 2]))
    for col, code in ordered:
        if code == _GDB_GEOMETRY:
            layer_fields += geometry_desc()
        elif code == _GDB_STRING:
            layer_fields += field_desc(col, code, struct.pack("<i", 2048) + bytes([1]))
        else:
            layer_fields += field_desc(col, code, bytes([_WIDTHS[code], 1]))
    n_fields = 1 + len(ordered)

    def encode_row(row) -> bytes:
        bitmap = bytearray((len(ordered) + 7) // 8)
        payload = bytearray()
        for bit, (col, code) in enumerate(ordered):
            val = row[col]
            if val is None:
                bitmap[bit // 8] |= 1 << (bit % 8)
            elif code == _GDB_GEOMETRY:
                gblob = encode_geometry(val)
                payload += _write_varuint(len(gblob)) + gblob
            elif code == _GDB_INT32:
                payload += struct.pack("<i", int(val))
            elif code == _GDB_FLOAT32:
                payload += struct.pack("<f", float(val))
            elif code == _GDB_FLOAT64:
                payload += struct.pack("<d", float(val))
            elif code == _GDB_DATETIME:
                import datetime as _dt

                delta = val - _dt.datetime(1899, 12, 30)
                payload += struct.pack("<d", delta.total_seconds() / 86400.0)
            else:
                enc = str(val).encode("utf-8")
                payload += _write_varuint(len(enc)) + enc
        return bytes(bitmap) + bytes(payload)

    emit(2, n_fields, layer_fields, [encode_row(r) for r in rows], 1 if has_geom else 0)
