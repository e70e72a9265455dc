"""DataEnvironment assembly: which layers are queryable together.

Reference: ``_get_data_environment`` (app/routes/datasets/queries.py:
654-701) — all single-band raster tile sets sharing a grid, at their
latest versions unless overridden (R11, queries.py:790-813), plus the
derived layers (date_conf, area-density, predefined CO2).

The registry join the reference does in SQL
(app/models/orm/queries/raster_assets.py:1-21) is a plain scan of the
asset registry here; the result is cached per (grid, overrides) like the
reference's alru_cache(16, ttl=300).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from gfw_data_api_spark.catalog.registry import Registry
from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.layers import (
    DerivedLayer,
    Layer,
    RasterTable,
    RasterTableRow,
    SourceLayer,
    area_density_base_name,
)


@dataclass
class DataEnvironment:
    grid: Grid
    layers: list[Layer] = field(default_factory=list)

    def layer_map(self) -> dict[str, Layer]:
        return {layer.name: layer for layer in self.layers}

    def get(self, name: str) -> Layer:
        return self.layer_map()[name]

    def source_of(self, layer: Layer) -> SourceLayer:
        """Resolve (possibly derived) layer → its physical source layer."""
        while isinstance(layer, DerivedLayer):
            layer = self.get(layer.source_layer)
        return layer


_CACHE: dict[tuple, tuple[float, DataEnvironment]] = {}
_CACHE_TTL = 300.0
_CACHE_MAX = 16


def _parse_values_table(raw: dict | None) -> RasterTable | None:
    if not raw:
        return None
    return RasterTable(
        rows=[RasterTableRow(int(r["value"]), str(r["meaning"])) for r in raw.get("rows", [])],
        default_meaning=raw.get("default_meaning"),
    )


def build_data_environment(
    registry: Registry,
    grid: Grid,
    version_overrides: dict[str, str] | None = None,
) -> DataEnvironment:
    """Collect every single-band raster tile set on ``grid`` (latest or
    overridden version) and expand derived layers."""
    from gfw_data_api_spark.raster import layers as L

    overrides = dict(version_overrides or {})
    key = (registry.root, grid.name, tuple(sorted(overrides.items())))
    cached = _CACHE.get(key)
    if cached and time.time() - cached[0] < _CACHE_TTL:
        return cached[1]

    env_layers: list[Layer] = []
    for dataset_entity in registry.datasets():
        dataset = dataset_entity.dataset
        version = overrides.get(dataset)
        if version is None:
            try:
                version = registry.resolve_version(dataset, "latest")
            except Exception:  # noqa: BLE001 — datasets without latest are skipped
                continue
        for asset in registry.assets_for(dataset, version):
            options = asset.creation_options
            if asset.asset_type != "raster_tile_set":
                continue
            if options.get("grid") != grid.name:
                continue
            if options.get("band_count", 1) > 1:
                continue
            pixel_meaning = options["pixel_meaning"]
            name = L.source_layer_name(dataset, pixel_meaning)
            no_data = options.get("no_data")
            if isinstance(no_data, list):
                no_data = no_data[0] if no_data else None
            env_layers.append(
                SourceLayer(
                    name=name,
                    source_uri=asset.asset_uri,
                    grid=grid.name,
                    no_data=no_data,
                    raster_table=_parse_values_table(options.get("values_table")),
                )
            )
            if pixel_meaning == "date_conf" or "date_conf" in pixel_meaning:
                env_layers.extend(L.date_conf_derived_layers(name, no_data))
            if area_density_base_name(pixel_meaning):
                env_layers.append(L.area_density_derived_layer(name, no_data))
            env_layers.extend(L.predefined_derived_layers(name))

    env = DataEnvironment(grid=grid, layers=env_layers)
    if len(_CACHE) >= _CACHE_MAX:
        _CACHE.pop(next(iter(_CACHE)))
    _CACHE[key] = (time.time(), env)
    return env


def clear_cache() -> None:
    _CACHE.clear()
