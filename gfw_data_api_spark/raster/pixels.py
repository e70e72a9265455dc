"""Pixel tables: the Spark materialization of raster tile sets.

Storage model (SURVEY.md §1.3 design decision): one parquet directory per
tile set, long format ``(tile_id, pixel_id, value)``, partitioned by
``tile_id`` and sorted by ``pixel_id`` within partitions. No-data pixels
are **not stored** (no_data ↔ absent ↔ null after joins) — a 30%-nodata
layer stores 30% fewer rows and aggregations skip nulls natively.

Coordinates are never stored: ``latitude``/``longitude``/``area__ha``
(the reserved virtual columns, queries.py:138-143) derive from
``(tile_id, pixel_id)`` with native column math — whole-stage codegen,
zero storage, and exact agreement with grid.py's driver-side math.

Layer joins co-partition on (tile_id, pixel_id); at cluster scale the
tile sets of one grid share a bucketed layout so the joins are
shuffle-free zips.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gfw_data_api_spark.functions.geometry import EARTH_RADIUS_M
from gfw_data_api_spark.raster.grid import Grid


def tile_set_from_array(
    spark: SparkSession,
    grid: Grid,
    tile_id: str,
    values: np.ndarray,
    no_data: float | int | None = 0,
) -> DataFrame:
    """Materialize one tile's array as a long-format pixel DataFrame.

    Test/ingest helper (P1 rasterize analog): array rows run north→south,
    columns west→east, matching the NW tile scheme.
    """
    n = grid.pixels_per_side
    if values.shape != (n, n):
        raise ValueError(f"tile array must be {n}x{n}, got {values.shape}")
    flat = values.reshape(-1)
    pixel_id = np.arange(flat.size, dtype=np.int64)
    if no_data is not None:
        keep = flat != no_data
        flat, pixel_id = flat[keep], pixel_id[keep]
    if np.issubdtype(values.dtype, np.floating):
        keep = ~np.isnan(flat)
        flat, pixel_id = flat[keep], pixel_id[keep]
    pdf = pd.DataFrame(
        {
            "tile_id": tile_id,
            "pixel_id": pixel_id,
            "value": flat.astype(np.float64),
        }
    )
    return spark.createDataFrame(pdf)


def write_tile_set(df: DataFrame, path: str) -> None:
    """Tile-partitioned, pixel-sorted parquet → partition pruning on
    tile_id + row-group skipping on pixel_id ranges."""
    (
        df.repartition("tile_id")
        .sortWithinPartitions("pixel_id")
        .write.mode("overwrite")
        .partitionBy("tile_id")
        .parquet(path)
    )


def write_tile_set_bucketed(df: DataFrame, table_name: str, buckets: int = 16) -> None:
    """Bucketed catalog-table layout for a tile set: every tile set of a
    grid written with the same ``bucketBy(buckets, tile_id, pixel_id)``
    spec joins co-partitioned — the layer join in the zonal path becomes
    a zip with NO shuffle on either side (asserted in test_plans).

    This is the 100 TB layout; the plain parquet layout (write_tile_set)
    stays the default because bucketed tables need a catalog."""
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, "tile_id", "pixel_id")
        .sortBy("tile_id", "pixel_id")
        .format("parquet")
        .saveAsTable(table_name)
    )


# ---------------------------------------------------------------------------
# coordinate / area column math (all native expressions)
# ---------------------------------------------------------------------------


def _tile_nw_lat(tile_id: Column) -> Column:
    deg = F.substring(tile_id, 1, 2).cast("double")
    return F.when(F.substring(tile_id, 3, 1) == "S", -deg).otherwise(deg)


def _tile_nw_lon(tile_id: Column) -> Column:
    deg = F.substring(tile_id, 5, 3).cast("double")
    return F.when(F.substring(tile_id, 8, 1) == "W", -deg).otherwise(deg)


def latitude_col(grid: Grid, tile_id: Column, pixel_id: Column) -> Column:
    """Pixel-center latitude from (tile_id, pixel_id)."""
    row = F.floor(pixel_id / F.lit(grid.pixels_per_side))
    return _tile_nw_lat(tile_id) - (row + F.lit(0.5)) * F.lit(grid.pixel_size)


def longitude_col(grid: Grid, tile_id: Column, pixel_id: Column) -> Column:
    col = pixel_id % F.lit(grid.pixels_per_side)
    return _tile_nw_lon(tile_id) + (col + F.lit(0.5)) * F.lit(grid.pixel_size)


def area_ha_col(grid: Grid, latitude: Column) -> Column:
    """Geodesic pixel area in hectares — the reserved ``area__ha`` column
    (R7), spherical-strip formula identical to
    functions.geometry.pixel_area_ha."""
    half = grid.pixel_size / 2.0
    lat1 = F.radians(latitude - F.lit(half))
    lat2 = F.radians(latitude + F.lit(half))
    dlon = float(np.radians(grid.pixel_size))
    return F.abs(
        F.lit(EARTH_RADIUS_M**2 * dlon) * (F.sin(lat2) - F.sin(lat1))
    ) / F.lit(10_000.0)


def with_pixel_coordinates(df: DataFrame, grid: Grid) -> DataFrame:
    """Attach the reserved virtual columns to a pixel DataFrame."""
    lat = latitude_col(grid, F.col("tile_id"), F.col("pixel_id"))
    df = df.withColumn("latitude", lat)
    df = df.withColumn("longitude", longitude_col(grid, F.col("tile_id"), F.col("pixel_id")))
    return df.withColumn("area__ha", area_ha_col(grid, F.col("latitude")))
