"""Raster tile cache: z/x/y web-mercator PNG tiles from a tile set.

Closes the reference's ``raster_tile_cache`` asset type
(app/models/enum/assets.py raster_tile_cache; batch job
app/tasks/raster_tile_cache_assets/* + batch/scripts/raster_tile_cache.sh,
which shell out to gdal2tiles/gdaladdo) with engine-native machinery:
the warp is pure column math (raster/warp.py), symbology is native
column math (raster/transform.apply_colormap), and only the final
per-tile PNG render runs Python — one applyInPandas over (z, x, y)
groups, each bounded at tile_px² pixels, written by the same
pure-Python PNG encoder the multimodal family uses.

Scale shape: per zoom level one warp shuffle (keyed by target tile),
then ONE render shuffle keyed (z, x, y) across all levels. Tiles
render independently with bounded memory; a 1000-executor cluster
renders a planet-scale pyramid with no driver involvement and no
GDAL container.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.transform import apply_colormap
from gfw_data_api_spark.raster.warp import reproject_to_mercator

TILE_SCHEMA = "z int, x int, y int, png binary"


def render_tile(rows: pd.DataFrame, tile_px: int) -> bytes:
    """Render one tile's (pixel_id, r, g, b) rows → RGBA PNG bytes.
    Absent pixels stay fully transparent (alpha 0), matching the
    nodata convention of the reference's PNG tiles."""
    from gfw_data_api_spark.llmops.multimodal import encode_png

    canvas = np.zeros((tile_px, tile_px, 4), dtype=np.uint8)
    pid = rows["pixel_id"].to_numpy(dtype=np.int64)
    ys, xs = pid // tile_px, pid % tile_px
    canvas[ys, xs, 0] = rows["r"].to_numpy(dtype=np.int64).clip(0, 255)
    canvas[ys, xs, 1] = rows["g"].to_numpy(dtype=np.int64).clip(0, 255)
    canvas[ys, xs, 2] = rows["b"].to_numpy(dtype=np.int64).clip(0, 255)
    canvas[ys, xs, 3] = 255
    return encode_png(canvas)


def raster_tile_cache(
    pixels: DataFrame,
    grid: Grid,
    colormap: dict[float, tuple[int, int, int]],
    min_zoom: int,
    max_zoom: int,
    kind: str = "discrete",
    method: str = "avg",
    tile_px: int = 256,
    value_col: str = "value",
) -> DataFrame:
    """(z, x, y, png) tiles for every zoom level in the range.

    Mirrors the reference pipeline order — warp to the zoom grid,
    apply symbology, cut tiles — as three composable stages of one
    lazy plan per level.
    """
    if min_zoom > max_zoom:
        raise ValueError("min_zoom must be <= max_zoom")
    levels = []
    for z in range(min_zoom, max_zoom + 1):
        warped = reproject_to_mercator(
            pixels, grid, z, tile_px=tile_px, method=method, value_col=value_col
        )
        colored = apply_colormap(warped, colormap, kind=kind)
        levels.append(
            colored.select(
                F.lit(z).alias("z"),
                F.col("tile_x").alias("x"),
                F.col("tile_y").alias("y"),
                "pixel_id",
                "r",
                "g",
                "b",
            )
        )
    union = levels[0]
    for lvl in levels[1:]:
        union = union.unionByName(lvl)

    def render(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        z, x, y = key
        return pd.DataFrame(
            {"z": [z], "x": [x], "y": [y], "png": [bytearray(render_tile(pdf, tile_px))]}
        )

    return union.groupBy("z", "x", "y").applyInPandas(render, schema=TILE_SCHEMA)
