"""Distributed spatial join: which left features intersect which right
features — without a cross join.

The scalable pattern (generalizes the reference's per-tile 1×1 export
loop, batch/python/export_1x1_grid.py): both sides explode to the grid
cells their bbox touches (native index math), candidates pair on an
equi-join over the cell key (an ordinary hash shuffle — no O(N×M)), the
bbox prefilter prunes in codegen, and the exact intersects UDF runs only
on survivors. Duplicate candidate pairs (a pair can share several cells)
collapse with a distinct on ids *before* the Python predicate.

Cell size is the tuning knob: ~the median feature size keeps the
explode factor and per-cell fan-in balanced; AQE handles residual skew
(a continent-sized feature is the salted-key case — it explodes to many
cells, which is exactly the work distribution we want).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.functions.geo_udfs import st_intersects_wkb


def _cells(bbox_col: str, cell_deg: float) -> F.Column:
    inv = 1.0 / cell_deg
    x0 = F.floor(F.col(bbox_col)[0] * inv).cast("long")
    x1 = F.floor(F.col(bbox_col)[2] * inv).cast("long")
    y0 = F.floor(F.col(bbox_col)[1] * inv).cast("long")
    y1 = F.floor(F.col(bbox_col)[3] * inv).cast("long")
    return F.flatten(
        F.transform(
            F.sequence(x0, x1),
            lambda x: F.transform(F.sequence(y0, y1), lambda y: x * F.lit(4_000_000) + y),
        )
    )


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    cell_deg: float = 1.0,
    geom_col: str = "geom",
    bbox_col: str = "gfw_bbox",
    how: str = "inner",
) -> DataFrame:
    """Pairs (left_id, right_id) whose geometries intersect.

    ``how='inner'`` returns intersecting pairs; ``how='left_semi'``
    returns distinct left ids with ≥1 intersection (the Q4 filter shape).
    """
    l = left.select(
        F.col(left_id).alias("_lid"),
        F.col(geom_col).alias("_lgeom"),
        F.col(bbox_col).alias("_lbox"),
        F.explode(_cells(bbox_col, cell_deg)).alias("_cell"),
    )
    r = right.select(
        F.col(right_id).alias("_rid"),
        F.col(geom_col).alias("_rgeom"),
        F.col(bbox_col).alias("_rbox"),
        F.explode(_cells(bbox_col, cell_deg)).alias("_cell"),
    )
    bbox_overlap = (
        (F.col("_lbox")[0] <= F.col("_rbox")[2])
        & (F.col("_rbox")[0] <= F.col("_lbox")[2])
        & (F.col("_lbox")[1] <= F.col("_rbox")[3])
        & (F.col("_rbox")[1] <= F.col("_lbox")[3])
    )
    candidates = (
        l.join(r, "_cell")
        .filter(bbox_overlap)
        .select("_lid", "_rid", "_lgeom", "_rgeom")
        .dropDuplicates(["_lid", "_rid"])
    )
    matched = candidates.filter(
        st_intersects_wkb(F.col("_lgeom"), F.col("_rgeom"))
    ).select(F.col("_lid").alias(left_id), F.col("_rid").alias(right_id))
    if how == "left_semi":
        return matched.select(left_id).distinct()
    return matched
