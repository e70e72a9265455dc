"""Raster plane: gridded tile sets, data environments, OTF zonal statistics.

The reference ships raster SQL to an external Lambda zonal engine
(app/routes/datasets/queries.py:548-625); here the whole path is a Spark
job over long-format pixel tables (SURVEY.md §1.3 design decision).
"""

from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.layers import (
    DerivedLayer,
    RasterTable,
    RasterTableRow,
    SourceLayer,
)

__all__ = ["Grid", "SourceLayer", "DerivedLayer", "RasterTable", "RasterTableRow"]
