"""Spark column functions and pandas UDFs over the geometry library.

Design rule (SURVEY.md §4.2): geometry predicates run in Arrow-batched
pandas UDFs, *after* a JVM-side bbox prefilter has discarded rows whose
``gfw_bbox`` cannot intersect the query geometry — so Python only touches
candidate rows. Web-mercator and bbox math are plain column expressions
(whole-stage codegen), never UDFs.

``register_geo_sql_functions`` registers the ST_* names used by the guard's
injected predicate (st_intersects / st_setsrid / st_geomfromgeojson, see
sql/guard.py:geometry_filter_sql) so guarded SQL executes verbatim on Spark.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from gfw_data_api_spark.functions import geometry as geo


@pandas_udf(T.BinaryType())
def make_point_wkb(lon: pd.Series, lat: pd.Series) -> pd.Series:
    """WKB Point(lon, lat) — ST_MakePoint/ST_SetSRID(…, 4326) analog."""
    return pd.Series(
        [
            None
            if x is None or y is None or pd.isna(x) or pd.isna(y)
            else geo.wkb_dumps({"type": "Point", "coordinates": [float(x), float(y)]})
            for x, y in zip(lon, lat)
        ]
    )


@pandas_udf(T.StringType())
def st_asgeojson(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else json.dumps(geo.wkb_loads(bytes(b))) for b in wkb]
    )


@pandas_udf(T.BinaryType())
def st_geomfromgeojson(geojson: pd.Series) -> pd.Series:
    return pd.Series(
        [None if s is None else geo.wkb_dumps(json.loads(s)) for s in geojson]
    )


@pandas_udf(T.DoubleType())
def st_area_ha(wkb: pd.Series) -> pd.Series:
    """gfw_area__ha = ST_Area(geom::geography)/10000 analog."""
    return pd.Series(
        [None if b is None else geo.geodesic_area_ha(geo.wkb_loads(bytes(b))) for b in wkb]
    )


@pandas_udf(T.ArrayType(T.DoubleType()))
def st_bbox(wkb: pd.Series) -> pd.Series:
    return pd.Series(
        [None if b is None else list(geo.bbox(geo.wkb_loads(bytes(b)))) for b in wkb]
    )


@pandas_udf(T.BooleanType())
def st_intersects_wkb(geom_a: pd.Series, geom_b: pd.Series) -> pd.Series:
    """Pairwise ST_Intersects on two WKB columns (one usually a literal).

    Constant sides are parsed once per Arrow batch.
    """
    cache: dict[bytes, geo.Geom] = {}

    def parse(b):
        key = bytes(b)
        if key not in cache:
            cache[key] = geo.wkb_loads(key)
        return cache[key]

    out = []
    for a, b in zip(geom_a, geom_b):
        if a is None or b is None:
            out.append(None)
        else:
            out.append(geo.intersects(parse(a), parse(b)))
    return pd.Series(out)


@pandas_udf(T.BinaryType())
def st_simplify(wkb: pd.Series, tolerance: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None
            if b is None
            else geo.wkb_dumps(geo.simplify(geo.wkb_loads(bytes(b)), float(t)))
            for b, t in zip(wkb, tolerance)
        ]
    )


def mercator_x(lon: Column) -> Column:
    """Web-mercator x as a native column expression (no UDF)."""
    return F.radians(lon) * F.lit(geo.WEB_MERCATOR_R)


def mercator_y(lat: Column) -> Column:
    import math

    return F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0))) * F.lit(
        geo.WEB_MERCATOR_R
    )


def bbox_overlap_predicate(bbox_col: Column, query_bbox: tuple) -> Column:
    """JVM-side prefilter: does the row's [xmin,ymin,xmax,ymax] array
    overlap the query bbox? Runs in whole-stage codegen and lets Catalyst
    skip parquet row groups via column stats on materialized bbox columns."""
    xmin, ymin, xmax, ymax = query_bbox
    return (
        (bbox_col[0] <= F.lit(xmax))
        & (bbox_col[2] >= F.lit(xmin))
        & (bbox_col[1] <= F.lit(ymax))
        & (bbox_col[3] >= F.lit(ymin))
    )


def register_geo_sql_functions(spark: SparkSession) -> None:
    """Expose the ST_* surface to Spark SQL so injected guarded predicates
    (sql/guard.py:geometry_filter_sql) run unchanged."""
    spark.udf.register("st_intersects", st_intersects_wkb)
    spark.udf.register("st_geomfromgeojson", st_geomfromgeojson)
    spark.udf.register("st_asgeojson", st_asgeojson)
    spark.udf.register("st_area_ha", st_area_ha)
    spark.udf.register("st_simplify", st_simplify)
    spark.udf.register("st_bbox", st_bbox)
    spark.udf.register("st_makepoint", make_point_wkb)
    # SRID bookkeeping is a no-op: everything is EPSG:4326 WKB
    spark.udf.register("st_setsrid", lambda b, srid: b, T.BinaryType())
