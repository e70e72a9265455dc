"""P1: rasterize a vector table onto a grid (SURVEY.md §2.5).

Reference: raster tile-set creation from vector sources — ``calc`` gives
the pixel value per feature, ``order asc|desc`` resolves overlaps,
``rasterize_method value|count`` (app/models/pydantic/
creation_options.py:149-212; executed by the external pixETL container).

Spark shape: features fan out to the tiles their bbox touches (native
tile-index math, like the 1×1 export), then ``applyInPandas`` per tile
rasterizes all of that tile's features against the pixel lattice with a
vectorized NumPy point-in-polygon — one task per tile, no driver loops,
and only bbox-window pixels are tested per feature.

Overlap semantics: features are painted in ``order`` (ascending by
default) and later paint overwrites earlier — GDAL burn order — so
``desc`` makes the smallest value win, matching the reference's
``order`` knob. ``count`` ignores values and accumulates coverage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfw_data_api_spark.functions import geometry as geo
from gfw_data_api_spark.raster.grid import Grid

PIXEL_SCHEMA = T.StructType(
    [
        T.StructField("tile_id", T.StringType()),
        T.StructField("pixel_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _points_in_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized ray-cast: are (px, py) inside the ring? (boundary not
    guaranteed either way — standard rasterization center-sample rule)."""
    inside = np.zeros(px.shape, dtype=bool)
    x1, y1 = ring[:-1, 0], ring[:-1, 1]
    x2, y2 = ring[1:, 0], ring[1:, 1]
    for ex1, ey1, ex2, ey2 in zip(x1, y1, x2, y2):
        if ey1 == ey2:
            continue
        crosses = (ey1 > py) != (ey2 > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_cross = ex1 + (py - ey1) * (ex2 - ex1) / (ey2 - ey1)
        inside ^= crosses & (px < x_cross)
    return inside


def _points_in_geom(px: np.ndarray, py: np.ndarray, geom: geo.Geom) -> np.ndarray:
    mask = np.zeros(px.shape, dtype=bool)
    for poly in geo._polygons_of(geom):
        in_poly = _points_in_ring(px, py, np.asarray(poly[0], dtype=np.float64))
        for hole in poly[1:]:
            in_poly &= ~_points_in_ring(px, py, np.asarray(hole, dtype=np.float64))
        mask |= in_poly
    return mask


def rasterize_vector(
    spark: SparkSession,
    df: DataFrame,
    grid: Grid,
    value_col: str | None = None,
    order: str = "asc",
    method: str = "value",
    geom_col: str = "geom",
    bbox_col: str = "gfw_bbox",
) -> DataFrame:
    """Rasterize features to a long-format pixel DataFrame.

    ``value_col``: numeric column burned per feature (``method='value'``);
    ``method='count'`` burns overlap counts instead.
    """
    if method not in ("value", "count"):
        raise ValueError("rasterize_method must be 'value' or 'count'")
    if method == "value" and value_col is None:
        raise ValueError("value_col required for rasterize_method='value'")

    step = grid.tile_deg
    # candidate tiles per feature from its bbox (native index math)
    ix0 = F.floor(F.col(bbox_col)[0] / step).cast("int")
    ix1 = F.floor(F.col(bbox_col)[2] / step).cast("int")
    iy0 = F.floor(F.col(bbox_col)[1] / step).cast("int")
    iy1 = F.floor(F.col(bbox_col)[3] / step).cast("int")
    cells = F.flatten(
        F.transform(
            F.sequence(ix0, ix1),
            lambda x: F.transform(F.sequence(iy0, iy1), lambda y: F.struct(x.alias("tx"), y.alias("ty"))),
        )
    )
    value_expr = (
        F.col(value_col).cast("double") if method == "value" else F.lit(1.0)
    )
    order_expr = value_expr if value_col else F.lit(0.0)
    fanned = (
        df.withColumn("_cell", F.explode(cells))
        .select(
            F.col(geom_col).alias("_geom"),
            value_expr.alias("_value"),
            order_expr.alias("_order"),
            F.col("_cell.tx").alias("_tx"),
            F.col("_cell.ty").alias("_ty"),
        )
    )

    n = grid.pixels_per_side
    pixel_size = grid.pixel_size
    ascending = order != "desc"
    count_mode = method == "count"

    def rasterize_tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        tx, ty = int(key[0]), int(key[1])
        lon_nw = tx * step
        lat_nw = ty * step + step
        tile_id = Grid.format_tile_id(lat_nw, lon_nw)
        lons = lon_nw + (np.arange(n) + 0.5) * pixel_size
        lats = lat_nw - (np.arange(n) + 0.5) * pixel_size
        raster = np.zeros((n, n), dtype=np.float64)
        pdf = pdf.sort_values("_order", ascending=ascending)
        for _, row in pdf.iterrows():
            geom = geo.wkb_loads(bytes(row["_geom"]))
            xmin, ymin, xmax, ymax = geo.bbox(geom)
            ci = np.where((lons >= xmin) & (lons <= xmax))[0]
            ri = np.where((lats >= ymin) & (lats <= ymax))[0]
            if not len(ci) or not len(ri):
                continue
            px, py = np.meshgrid(lons[ci], lats[ri])
            mask = _points_in_geom(px, py, geom)
            if not mask.any():
                continue
            window = raster[np.ix_(ri, ci)]
            if count_mode:
                window[mask] += 1.0
            else:
                window[mask] = row["_value"]
            raster[np.ix_(ri, ci)] = window
        flat = raster.reshape(-1)
        keep = flat != 0.0
        pixel_ids = np.nonzero(keep)[0].astype(np.int64)
        return pd.DataFrame(
            {"tile_id": tile_id, "pixel_id": pixel_ids, "value": flat[keep]}
        )

    return fanned.groupBy("_tx", "_ty").applyInPandas(rasterize_tile, schema=PIXEL_SCHEMA)
