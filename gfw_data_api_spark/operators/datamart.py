"""Datamart precompute: tree cover loss by driver.

Reference: app/tasks/datamart/land.py:20-110 + result model
app/models/pydantic/datamart.py:150-207 — a saved analysis resource:
run the grouped zonal query over (loss year × driver category) at a
canopy-cover threshold, and report both yearly rows and per-driver
totals (loss area + gross carbon emissions), ordered by the driver
value map. The drivers dataset dispatches between the TSC and
WRI-Google categorizations based on which appears in the requested
dataset versions.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import SparkSession

from gfw_data_api_spark.catalog.registry import Registry
from gfw_data_api_spark.operators.watchdog import (
    DEFAULT_QUERY_TIMEOUT_S,
    collect_with_timeout,
)
from gfw_data_api_spark.raster.data_environment import build_data_environment
from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.zonal import query_raster

EMISSIONS_LAYER = "gfw_forest_carbon_gross_emissions__Mg_CO2e"

# driver categorization configs (land.py:32-60)
TCL_DRIVERS_DATASET_CONFIGS: dict[str, dict[str, Any]] = {
    "tsc_tree_cover_loss_drivers": {
        "sql_driver_field": "tsc_tree_cover_loss_drivers__driver",
        "driver_value_map": {
            "Unknown": 0,
            "Permanent agriculture": 1,
            "Commodity driven deforestation": 2,
            "Shifting agriculture": 3,
            "Forestry": 4,
            "Wildfire": 5,
            "Urbanization": 6,
            "Other natural disturbances": 7,
        },
    },
    "wri_google_tree_cover_loss_drivers": {
        "sql_driver_field": "wri_google_tree_cover_loss_drivers__category",
        "driver_value_map": {
            "Unknown": 0,
            "Permanent agriculture": 1,
            "Hard commodities": 2,
            "Shifting cultivation": 3,
            "Logging": 4,
            "Wildfire": 5,
            "Settlements & Infrastructure": 6,
            "Other natural disturbances": 7,
        },
    },
}


def _select_drivers_config(version_overrides: dict[str, str] | None) -> dict[str, Any]:
    """Dispatch on which drivers dataset the request pins (land.py:72-80);
    TSC is the default categorization."""
    for dataset in ("tsc_tree_cover_loss_drivers", "wri_google_tree_cover_loss_drivers"):
        if version_overrides and dataset in version_overrides:
            return TCL_DRIVERS_DATASET_CONFIGS[dataset]
    return TCL_DRIVERS_DATASET_CONFIGS["tsc_tree_cover_loss_drivers"]


def compute_tree_cover_loss_by_driver(
    spark: SparkSession,
    registry: Registry,
    geometry: dict[str, Any],
    canopy_cover: int = 30,
    loss_dataset: str = "umd_tree_cover_loss",
    loss_version: str = "latest",
    version_overrides: dict[str, str] | None = None,
    resource_dir: str | None = None,
    timeout_s: float = DEFAULT_QUERY_TIMEOUT_S,
) -> dict[str, Any]:
    """Run the precompute and persist it as a datamart resource.

    Returns the reference's result shape: yearly rows plus per-driver
    totals, each carrying loss area and (when the emissions layer exists
    in the data environment) gross carbon emissions.
    """
    config = _select_drivers_config(version_overrides)
    driver_field = config["sql_driver_field"]
    value_map: dict[str, int] = config["driver_value_map"]

    loss_version = registry.resolve_version(loss_dataset, loss_version)
    asset = registry.get_default_asset(loss_dataset, loss_version)
    env = build_data_environment(
        registry, Grid.parse(asset.creation_options["grid"]), version_overrides
    )
    has_emissions = EMISSIONS_LAYER in env.layer_map()

    emissions_select = f", SUM({EMISSIONS_LAYER}) AS emissions" if has_emissions else ""
    sql = (
        f"SELECT umd_tree_cover_loss__year, {driver_field}, "
        f"SUM(area__ha) AS area__ha{emissions_select} FROM data "
        f"WHERE umd_tree_cover_density_2000__threshold >= {canopy_cover} "
        f"GROUP BY umd_tree_cover_loss__year, {driver_field}"
    )
    df = query_raster(
        spark, registry, loss_dataset, loss_version, sql, geometry, version_overrides
    )
    collected = collect_with_timeout(spark, df, timeout_s)

    rows = []
    for row in collected:
        item = row.asDict()
        driver = item[driver_field] if item[driver_field] is not None else "Unknown"
        rows.append(
            {
                "drivers_type": driver,
                "loss_year": int(item["umd_tree_cover_loss__year"]),
                "loss_area_ha": float(item["area__ha"]),
                "gross_carbon_emissions_Mg": float(item["emissions"])
                if has_emissions and item.get("emissions") is not None
                else 0.0,
            }
        )
    # ordered by mapped pixel value like the reference (datamart.py:175-190);
    # unknown categories sort first with the Unknown code
    rows.sort(key=lambda r: (value_map.get(r["drivers_type"], 0), r["loss_year"]))

    totals: dict[str, dict[str, float]] = {}
    for row in rows:
        agg = totals.setdefault(
            row["drivers_type"], {"loss_area_ha": 0.0, "gross_carbon_emissions_Mg": 0.0}
        )
        agg["loss_area_ha"] += row["loss_area_ha"]
        agg["gross_carbon_emissions_Mg"] += row["gross_carbon_emissions_Mg"]
    by_driver = [
        {"drivers_type": driver, **values}
        for driver, values in sorted(totals.items(), key=lambda kv: value_map.get(kv[0], 0))
    ]

    resource = {
        "resource_id": str(uuid.uuid4()),
        "status": "saved",
        "canopy_cover": canopy_cover,
        "result": {
            "tree_cover_loss_by_driver": by_driver,
            "yearly_tree_cover_loss_by_driver": rows,
        },
    }
    out_dir = resource_dir or os.path.join(registry.root, "datamart")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{resource['resource_id']}.json"), "w") as fh:
        json.dump(resource, fh)
    return resource


def get_resource(registry: Registry, resource_id: str, resource_dir: str | None = None) -> dict:
    """Retrieve a saved datamart resource (GET .../{resource_id})."""
    from gfw_data_api_spark.catalog.registry import RegistryError

    out_dir = resource_dir or os.path.join(registry.root, "datamart")
    path = os.path.join(out_dir, f"{resource_id}.json")
    if not os.path.basename(path).replace(".json", "") == resource_id or not os.path.exists(path):
        raise RegistryError(f"Datamart resource {resource_id} not found.", 404)
    with open(path) as fh:
        return json.load(fh)
