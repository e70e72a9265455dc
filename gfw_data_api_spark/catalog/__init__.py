"""Catalog plane: dataset → version → asset registry + warehouse layout."""

from gfw_data_api_spark.catalog.registry import (
    Registry,
    RegistryError,
    default_asset_type,
)

__all__ = ["Registry", "RegistryError", "default_asset_type"]
