"""Datamart precompute: tree cover loss by driver.

Reference: app/tasks/datamart/land.py:40-110 — a saved analysis resource:
run the grouped zonal query over (loss year × driver category) at a
canopy-cover threshold, rename the driver field, store the result under a
resource id. The drivers layer is a value-table raster, so the group key
arrives as decoded meaning strings.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import SparkSession

from gfw_data_api_spark.catalog.registry import Registry
from gfw_data_api_spark.raster.zonal import query_raster

# driver categories → codes (land.py:28-60)
TSC_DRIVER_VALUE_MAP = {
    "Unknown": 0,
    "Commodity driven deforestation": 1,
    "Shifting agriculture": 3,
    "Forestry": 4,
    "Wildfire": 5,
    "Urbanization": 6,
    "Other natural disturbances": 7,
}


def compute_tree_cover_loss_by_driver(
    spark: SparkSession,
    registry: Registry,
    geometry: dict[str, Any],
    canopy_cover: int = 30,
    driver_field: str = "tsc_tree_cover_loss_drivers__driver",
    loss_dataset: str = "umd_tree_cover_loss",
    loss_version: str = "latest",
    version_overrides: dict[str, str] | None = None,
    resource_dir: str | None = None,
) -> dict[str, Any]:
    """Run the precompute and persist it as a datamart resource.

    Returns {resource_id, status, result: [{year, driver, area_ha}...]}.
    """
    sql = (
        "SELECT umd_tree_cover_loss__year, "
        f"{driver_field}, SUM(area__ha) AS area__ha FROM data "
        f"WHERE umd_tree_cover_density_2000__threshold >= {canopy_cover} "
        f"GROUP BY umd_tree_cover_loss__year, {driver_field}"
    )
    loss_version = registry.resolve_version(loss_dataset, loss_version)
    df = query_raster(
        spark, registry, loss_dataset, loss_version, sql, geometry, version_overrides
    )
    rows = []
    for row in df.collect():
        item = row.asDict()
        # rename the driver field like the reference (land.py:96-100)
        item["tree_cover_loss_driver"] = item.pop(driver_field)
        rows.append(
            {
                "umd_tree_cover_loss__year": int(item["umd_tree_cover_loss__year"]),
                "tree_cover_loss_driver": item["tree_cover_loss_driver"],
                "area_ha": float(item["area__ha"]),
            }
        )
    resource = {
        "resource_id": str(uuid.uuid4()),
        "status": "saved",
        "canopy_cover": canopy_cover,
        "result": sorted(
            rows, key=lambda r: (r["umd_tree_cover_loss__year"], r["tree_cover_loss_driver"])
        ),
    }
    out_dir = resource_dir or os.path.join(registry.root, "datamart")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{resource['resource_id']}.json"), "w") as fh:
        json.dump(resource, fh)
    return resource
