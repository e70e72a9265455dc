"""Vector source ingestion (E5-E7, SURVEY.md §2.2).

The reference shells out to ogr2ogr (batch/scripts/create_vector_schema.sh,
load_vector_data.sh) then derives system columns in SQL
(_add_gfw_fields_sql.sh, clip_and_reproject_geom.sh). Here:

- GeoJSONSeq (one feature per line) is the scale path: ``spark.read.text``
  is splittable, features parse in ``mapInPandas`` (Arrow batches), so a
  100 TB load is ordinary partition parallelism.
- FeatureCollection files and WKB-hex CSVs are convenience paths for
  small sources (parsed driver-side / via the tabular reader).

Derived system columns (E5, _add_gfw_fields_sql.sh):
- ``gfw_area__ha``     : geodesic area / 10000
- ``gfw_geostore_id``  : md5(geojson) formatted as a UUID
- ``gfw_geojson``      : canonical GeoJSON text
- ``gfw_bbox``         : [xmin, ymin, xmax, ymax]
- ``geom_wm``          : web-mercator WKB, latitudes clipped to ±85.05°
                         before transform (E7, clip_and_reproject_geom.sh)
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gfw_data_api_spark.functions import geometry as geo

WEB_MERCATOR_MAX_LAT = 85.05112878


@pandas_udf(T.BinaryType())
def wkb_to_web_mercator(wkb: pd.Series) -> pd.Series:
    """E7: clip to ±85.05° then project each vertex to EPSG:3857."""

    def project(geom: geo.Geom) -> geo.Geom:
        def walk(coords):
            if coords and isinstance(coords[0], (int, float)):
                lat = max(min(coords[1], WEB_MERCATOR_MAX_LAT), -WEB_MERCATOR_MAX_LAT)
                x, y = geo.web_mercator(coords[0], lat)
                return [x, y]
            return [walk(c) for c in coords]

        return {"type": geom["type"], "coordinates": walk(geom["coordinates"])}

    return pd.Series(
        [None if b is None else geo.wkb_dumps(project(geo.wkb_loads(bytes(b)))) for b in wkb]
    )


def md5_as_uuid(col: F.Column) -> F.Column:
    """``md5(...)::uuid`` (crud/geostore.py:120): hyphenate the hex digest."""
    h = F.md5(col)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )


def add_gfw_fields(df: DataFrame, geom_col: str = "geom") -> DataFrame:
    """E5: derive the GFW system columns from a WKB geometry column."""
    from gfw_data_api_spark.functions.geo_udfs import st_area_ha, st_asgeojson, st_bbox

    df = df.withColumn("gfw_geojson", st_asgeojson(F.col(geom_col)))
    df = df.withColumn("gfw_area__ha", st_area_ha(F.col(geom_col)))
    df = df.withColumn("gfw_geostore_id", md5_as_uuid(F.col("gfw_geojson")))
    df = df.withColumn("gfw_bbox", st_bbox(F.col(geom_col)))
    df = df.withColumn("geom_wm", wkb_to_web_mercator(F.col(geom_col)))
    df = df.withColumn("created_on", F.current_timestamp())
    df = df.withColumn("updated_on", F.current_timestamp())
    return df


def _properties_schema(features: list[dict]) -> T.StructType:
    """Infer a property schema from sample features (the reference lets
    ogr2ogr infer; we sample like create_vector_schema.sh does)."""
    fields: dict[str, T.DataType | None] = {}  # None = only nulls seen so far
    for feat in features:
        for key, value in (feat.get("properties") or {}).items():
            if value is None:
                # register the key but let a later non-null value type it
                fields.setdefault(key, None)
                continue
            if isinstance(value, bool):
                inferred: T.DataType = T.BooleanType()
            elif isinstance(value, int):
                inferred = T.LongType()
            elif isinstance(value, float):
                inferred = T.DoubleType()
            else:
                inferred = T.StringType()
            current = fields.get(key)
            if current is None:
                fields[key] = inferred
            elif current != inferred and current != T.StringType():
                # type conflict widens: int+float → double, anything+str → str
                if {type(current), type(inferred)} == {T.LongType, T.DoubleType}:
                    fields[key] = T.DoubleType()
                else:
                    fields[key] = T.StringType()
    struct = T.StructType(
        [
            T.StructField(name, dtype if dtype is not None else T.StringType(), True)
            for name, dtype in fields.items()
        ]
    )
    struct.add(T.StructField("geom", T.BinaryType(), True))
    return struct


def read_geojson_seq(spark: SparkSession, path: str, sample_size: int = 100) -> DataFrame:
    """E6 scale path: newline-delimited GeoJSON features → WKB rows."""
    lines = spark.read.text(path)
    sample = [json.loads(r.value) for r in lines.limit(sample_size).collect() if r.value.strip()]
    schema = _properties_schema(sample)
    prop_names = [f.name for f in schema.fields if f.name != "geom"]

    def parse(batches):
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                if not line.strip():
                    continue
                feat = json.loads(line)
                props = feat.get("properties") or {}
                row = {name: props.get(name) for name in prop_names}
                geom = feat.get("geometry")
                row["geom"] = geo.wkb_dumps(geom) if geom else None
                rows.append(row)
            yield pd.DataFrame(rows, columns=prop_names + ["geom"])

    return lines.mapInPandas(parse, schema=schema)


def read_feature_collection(spark: SparkSession, path: str) -> DataFrame:
    """E6 convenience path: a single FeatureCollection file (driver-side
    parse; use GeoJSONSeq for anything large)."""
    with open(path) as fh:
        collection = json.load(fh)
    features = collection["features"]
    schema = _properties_schema(features)
    prop_names = [f.name for f in schema.fields if f.name != "geom"]
    rows = []
    for feat in features:
        props = feat.get("properties") or {}
        row = [props.get(name) for name in prop_names]
        geom = feat.get("geometry")
        row.append(bytearray(geo.wkb_dumps(geom)) if geom else None)
        rows.append(row)
    return spark.createDataFrame(rows, schema)


@pandas_udf(T.BinaryType())
def wkb_from_hex(hex_col: pd.Series) -> pd.Series:
    """Decode a WKB-hex text column (the reference's tests/fixtures/test.csv
    carries geometries this way)."""
    return pd.Series([None if v is None else bytes.fromhex(v) for v in hex_col])
