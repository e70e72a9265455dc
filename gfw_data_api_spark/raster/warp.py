"""P3/P4: reprojection of lat/lng tile sets to web-mercator tile pyramids.

The reference warps with gdalwarp (batch/scripts/unify_projection.sh,
batch/python/resample.py builds the EPSG:3857 zoom pyramid). Here the
warp is an ordinary DataFrame computation — no GDAL, no UDF:

- every source pixel's (latitude, longitude) derives from
  (tile_id, pixel_id) with native trig (pixels.py);
- its target position in the zoom-z mercator grid is two more native
  expressions (the slippy-map transform);
- pixels landing in the same target cell combine with the chosen
  resampling aggregate (avg/min/max/sum; ``nearest`` keeps the pixel
  whose center is closest to the target-cell center).

Forward mapping + aggregation is exact for the pyramid use case (target
resolution ≤ source — every target cell receives ≥1 source pixel); it is
the classic scale-out formulation because it is ONE groupBy shuffle over
pixels, embarrassingly parallel, with no per-tile Python. For
target-finer-than-source (upsampling) use the COG/overview path instead.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.pixels import latitude_col, longitude_col

_RESAMPLERS = {
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": F.count,
}


def _mercator_global_px(lon: Column, lat: Column, zoom: int, tile_px: int) -> tuple[Column, Column]:
    """Global integer pixel coordinates in the zoom-z web-mercator grid."""
    world = F.lit(float((1 << zoom) * tile_px))
    clamped = F.greatest(F.least(lat, F.lit(85.051128)), F.lit(-85.051128))
    merc = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(clamped) / 2.0))
    gx = F.floor((lon + 180.0) / 360.0 * world).cast("long")
    gy = F.floor((F.lit(1.0) - merc / F.lit(math.pi)) / 2.0 * world).cast("long")
    upper = F.lit(int((1 << zoom) * tile_px) - 1)
    return F.least(gx, upper), F.least(gy, upper)


def reproject_to_mercator(
    pixels: DataFrame,
    grid: Grid,
    zoom: int,
    tile_px: int = 256,
    method: str = "avg",
    value_col: str = "value",
) -> DataFrame:
    """Warp a long-format lat/lng tile set to the zoom-``zoom`` mercator
    tile grid: returns (tile_x, tile_y, pixel_id, value).

    ``method``: avg | min | max | sum | count | nearest.
    """
    lat = latitude_col(grid, F.col("tile_id"), F.col("pixel_id"))
    lon = longitude_col(grid, F.col("tile_id"), F.col("pixel_id"))
    gx, gy = _mercator_global_px(lon, lat, zoom, tile_px)
    placed = pixels.select(
        (gx / tile_px).cast("int").alias("tile_x"),
        (gy / tile_px).cast("int").alias("tile_y"),
        ((gy % tile_px) * tile_px + (gx % tile_px)).cast("long").alias("pixel_id"),
        F.col(value_col).alias("_v"),
        gx.alias("_gx"),
        gy.alias("_gy"),
        lat.alias("_lat"),
        lon.alias("_lon"),
    )
    if method in _RESAMPLERS:
        agg = _RESAMPLERS[method](F.col("_v")).cast("double").alias("value")
        return placed.groupBy("tile_x", "tile_y", "pixel_id").agg(agg)
    if method == "nearest":
        # distance from the source pixel center to the target cell center,
        # in fractional target pixels (native math); min_by picks the
        # closest source pixel deterministically (ties by value)
        world = float((1 << zoom) * tile_px)
        cx = (F.col("_gx") + 0.5) * 360.0 / world - 180.0
        merc_center = F.lit(math.pi) * (1.0 - 2.0 * (F.col("_gy") + 0.5) / world)
        # inverse gudermannian: lat = atan(sinh(m))
        cy = F.degrees(F.atan((F.exp(merc_center) - F.exp(-merc_center)) / 2.0))
        dist = (F.col("_lon") - cx) * (F.col("_lon") - cx) + (F.col("_lat") - cy) * (
            F.col("_lat") - cy
        )
        return (
            placed.withColumn("_d", dist)
            .groupBy("tile_x", "tile_y", "pixel_id")
            .agg(F.min_by(F.struct("_v"), F.struct("_d", "_v")).getField("_v").cast("double").alias("value"))
        )
    raise ValueError(f"unknown resampling method {method!r}")


def mercator_pyramid(
    pixels: DataFrame,
    grid: Grid,
    min_zoom: int,
    max_zoom: int,
    tile_px: int = 256,
    method: str = "avg",
) -> dict[int, DataFrame]:
    """The P4 zoom pyramid: one warp per level (each a single shuffle).

    Levels are independent jobs over the same source — at scale you
    materialize max_zoom once and derive coarser levels from it with
    2×2 reductions (transform.downsample); this function is the direct
    per-level warp used when levels are few.
    """
    return {
        z: reproject_to_mercator(pixels, grid, z, tile_px, method)
        for z in range(min_zoom, max_zoom + 1)
    }
