"""User-facing metadata documents for datasets / versions / assets.

Reference: app/models/orm/mixins.py (shared field vocabulary),
dataset_metadata.py / version_metadata.py / asset_metadata.py (per-level
fields), app/crud/metadata.py (create/get/update + the
``update_metadata`` parent-merge used when serving versions: dataset
metadata is the base, version fields with non-null values override —
crud/metadata.py:334-352).

Storage is a JSON document per level key in the registry directory —
the reference's Postgres rows are pure metadata with no query path, so
a document store is the right weight here.
"""

from __future__ import annotations

import json
import os
from typing import Any

from gfw_data_api_spark.catalog.registry import RegistryError

# models/orm/mixins.py MetadataMixin
COMMON_FIELDS = {
    "title",
    "subtitle",
    "spatial_resolution",
    "resolution_description",
    "geographic_coverage",
    "update_frequency",
    "citation",
    "scale",
}

# models/orm/dataset_metadata.py
DATASET_FIELDS = COMMON_FIELDS | {
    "source",
    "license",
    "data_language",
    "overview",
    "function",
    "cautions",
    "key_restrictions",
    "tags",
    "why_added",
    "learn_more",
}

# models/orm/version_metadata.py
VERSION_FIELDS = COMMON_FIELDS | {
    "content_date",
    "content_start_date",
    "content_end_date",
    "content_date_description",
    "last_update",
    "description",
}

# models/orm/asset_metadata.py (fields/bands carried as nested lists)
ASSET_FIELDS = {
    "resolution",
    "min_zoom",
    "max_zoom",
    "tags",
    "fields",
    "bands",
}

_LEVEL_FIELDS = {
    "dataset": DATASET_FIELDS,
    "version": VERSION_FIELDS,
    "asset": ASSET_FIELDS,
}


class MetadataStore:
    """JSON-backed metadata documents keyed by (level, key)."""

    def __init__(self, path: str):
        self._path = path
        self._docs: dict[str, dict[str, Any]] = {}
        if os.path.exists(path):
            with open(path) as fh:
                self._docs = json.load(fh)

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self._path) or ".", exist_ok=True)
        tmp = self._path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._docs, fh, indent=1)
        os.replace(tmp, self._path)

    @staticmethod
    def _validate(level: str, data: dict[str, Any]) -> None:
        allowed = _LEVEL_FIELDS[level]
        unknown = set(data) - allowed
        if unknown:
            raise RegistryError(
                f"Unknown {level} metadata fields: {sorted(unknown)}.", 422
            )

    def create(self, level: str, key: str, data: dict[str, Any]) -> dict[str, Any]:
        """crud/metadata.py create_*_metadata: one record per key."""
        self._validate(level, data)
        doc_key = f"{level}:{key}"
        if doc_key in self._docs:
            raise RegistryError(
                f"Failed to create metadata. {level} {key} has an existing "
                "metadata record.",
                400,
            )
        self._docs[doc_key] = dict(data)
        self._save()
        return self._docs[doc_key]

    def get(self, level: str, key: str) -> dict[str, Any]:
        doc = self._docs.get(f"{level}:{key}")
        if doc is None:
            raise RegistryError(
                f"Could not find requested metadata {level} {key}", 404
            )
        return dict(doc)

    def get_or_empty(self, level: str, key: str) -> dict[str, Any]:
        return dict(self._docs.get(f"{level}:{key}", {}))

    def update(self, level: str, key: str, data: dict[str, Any]) -> dict[str, Any]:
        """Partial update: named fields change, others are untouched
        (PATCH /dataset/{d} contract). Creates the record when absent —
        the reference's dataset/version routes create metadata inline
        with the entity, which the registry here does not."""
        self._validate(level, data)
        doc_key = f"{level}:{key}"
        doc = self._docs.setdefault(doc_key, {})
        doc.update(data)
        self._save()
        return dict(doc)

    def delete(self, level: str, key: str) -> dict[str, Any]:
        doc = self._docs.pop(f"{level}:{key}", None)
        if doc is None:
            raise RegistryError(
                f"Could not find requested metadata {level} {key}", 404
            )
        self._save()
        return doc

    def version_view(self, dataset: str, version: str) -> dict[str, Any]:
        """Version metadata with dataset-parent inheritance: parent base,
        version's non-null fields override (crud/metadata.py:334-352)."""
        merged = self.get_or_empty("dataset", dataset)
        overrides = {
            k: v
            for k, v in self.get_or_empty("version", f"{dataset}/{version}").items()
            if v is not None
        }
        merged.update(overrides)
        return merged
