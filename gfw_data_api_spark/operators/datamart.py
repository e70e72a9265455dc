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


def apply_overrides_and_remove_mutually_exclusive_datasets(
    dataset_versions: dict[str, str] | None,
) -> dict[str, str]:
    """Reference land.py:325-341: overriding with one driver
    categorization evicts its mutually-exclusive twin, so a request
    pinning wri_google never also queries tsc."""
    mutually_exclusive = {
        "wri_google_tree_cover_loss_drivers": "tsc_tree_cover_loss_drivers",
        "tsc_tree_cover_loss_drivers": "wri_google_tree_cover_loss_drivers",
    }
    out: dict[str, str] = {}
    for dataset, version in (dataset_versions or {}).items():
        twin = mutually_exclusive.get(dataset)
        if twin is not None:
            out.pop(twin, None)
        out[dataset] = version
    return out


def resource_id_for(
    geometry: dict[str, Any] | None,
    canopy_cover: int,
    dataset_versions: dict[str, str] | None,
) -> str:
    """Deterministic resource id (land.py:270-273 uuid5 over the request
    params) — identical requests collide on purpose, giving the 409
    dedup and the search-by-params route."""
    aoi = json.dumps(geometry, sort_keys=True) if geometry else "null"
    dv = json.dumps(dataset_versions or {}, sort_keys=True)
    return str(
        uuid.uuid5(
            uuid.NAMESPACE_OID,
            f"tree_cover_loss_by_driver_{aoi}_{canopy_cover}_{dv}",
        )
    )


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
    resource_id: str | None = None,
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
        "resource_id": resource_id
        or resource_id_for(geometry, canopy_cover, version_overrides),
        "status": "saved",
        "canopy_cover": canopy_cover,
        "result": {
            "tree_cover_loss_by_driver": by_driver,
            "yearly_tree_cover_loss_by_driver": rows,
        },
    }
    _write_resource(registry, resource, resource_dir)
    return resource


def _resource_path(registry: Registry, resource_id: str, resource_dir: str | None) -> str:
    out_dir = resource_dir or os.path.join(registry.root, "datamart")
    return os.path.join(out_dir, f"{resource_id}.json")


def _write_resource(registry: Registry, resource: dict, resource_dir: str | None = None) -> None:
    path = _resource_path(registry, resource["resource_id"], resource_dir)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(resource, fh)
    os.replace(tmp, path)


def save_pending_resource(
    registry: Registry,
    resource_id: str,
    canopy_cover: int,
    resource_dir: str | None = None,
) -> dict:
    """Reference land.py:298-308 — register the pending row the POST's
    202 points at; the background compute overwrites it."""
    resource = {
        "resource_id": resource_id,
        "status": "pending",
        "canopy_cover": canopy_cover,
        "message": "Resource is still processing, follow Retry-After header.",
        "result": None,
    }
    _write_resource(registry, resource, resource_dir)
    return resource


def save_failed_resource(
    registry: Registry,
    resource_id: str,
    canopy_cover: int,
    message: str,
    resource_dir: str | None = None,
) -> dict:
    resource = {
        "resource_id": resource_id,
        "status": "failed",
        "canopy_cover": canopy_cover,
        "message": message,
        "result": None,
    }
    _write_resource(registry, resource, resource_dir)
    return resource


def resource_exists(registry: Registry, resource_id: str, resource_dir: str | None = None) -> bool:
    return os.path.exists(_resource_path(registry, resource_id, resource_dir))


def get_resource(registry: Registry, resource_id: str, resource_dir: str | None = None) -> dict:
    """Retrieve a saved datamart resource (GET .../{resource_id})."""
    from gfw_data_api_spark.catalog.registry import RegistryError

    path = _resource_path(registry, resource_id, resource_dir)
    if not os.path.basename(path).replace(".json", "") == resource_id or not os.path.exists(path):
        raise RegistryError(
            "Resource not found, may require computation.", 404
        )
    with open(path) as fh:
        return json.load(fh)


def delete_resource(registry: Registry, resource_id: str, resource_dir: str | None = None) -> None:
    """Reference land.py:154-192: only FAILED resources are deletable
    (204); anything else is a 400, missing is a 404."""
    from gfw_data_api_spark.catalog.registry import RegistryError

    resource = get_resource(registry, resource_id, resource_dir)
    if resource.get("status") != "failed":
        raise RegistryError("Only resources with 'failed' status can be deleted", 400)
    os.remove(_resource_path(registry, resource_id, resource_dir))


def resource_to_csv(resource: dict) -> str:
    """CSV rendering of the yearly rows (land.py:145-149 Accept:
    text/csv path)."""
    import csv
    import io

    buf = io.StringIO()
    writer = csv.writer(buf)
    writer.writerow(
        ["drivers_type", "loss_year", "loss_area_ha", "gross_carbon_emissions_Mg"]
    )
    for row in (resource.get("result") or {}).get(
        "yearly_tree_cover_loss_by_driver", []
    ):
        writer.writerow(
            [
                row["drivers_type"],
                row["loss_year"],
                row["loss_area_ha"],
                row["gross_carbon_emissions_Mg"],
            ]
        )
    return buf.getvalue()
