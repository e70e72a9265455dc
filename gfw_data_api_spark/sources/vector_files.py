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
    collect is deliberate — exports of query results are driver-sized."""
    rows = df.collect()
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
# ---------------------------------------------------------------------------


class FileGDBUnsupportedError(NotImplementedError):
    """Raised for a STRUCTURALLY VALID .gdb whose row data this
    environment cannot decode."""


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


def read_file_gdb(spark, path: str, layer: str | None = None):
    """E6 FileGDB driver: accepted, validated, and clearly rejected.

    The .gdbtable row format is ESRI-proprietary (readable only through
    reverse-engineered codecs like GDAL's OpenFileGDB, unavailable
    here), so after validating the FileGDB structure this raises
    ``FileGDBUnsupportedError`` telling the user exactly what to do —
    matching the repo's policy for missing codecs (multimodal decode):
    real plumbing, explicit stub at the codec boundary.
    """
    info = inspect_file_gdb(path)
    raise FileGDBUnsupportedError(
        f"{path!r} is a valid ESRI FileGDB ({info['n_tables']} internal "
        "tables), but no OpenFileGDB codec is available in this "
        "environment. Convert the source with "
        "`ogr2ogr -f GeoJSONSeq out.geojsonl <src.gdb> [layer]` (or GPKG) "
        "and ingest with source_driver='GeoJSONSeq' or 'GPKG'."
    )
