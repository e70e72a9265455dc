"""Geostore multi-origin fallback (catalog/geostore.py, reference
app/utils/geostore.py): local first, external resolvers next, 404 only
after every source misses, 500 on a source error."""

from __future__ import annotations

import pytest

from gfw_data_api_spark.catalog.geostore import Geostore
from gfw_data_api_spark.catalog.registry import Registry, RegistryError

SQUARE = {
    "type": "Polygon",
    "coordinates": [[[10.0, 0.0], [11.0, 0.0], [11.0, 1.0], [10.0, 1.0], [10.0, 0.0]]],
}


@pytest.fixture()
def registry(tmp_path):
    return Registry(str(tmp_path / "cat"))


def _fake_rw(known: dict):
    calls = []

    def resolve(geostore_id):
        calls.append(geostore_id)
        return known.get(geostore_id)

    resolve.calls = calls
    return resolve


def test_local_hit_never_calls_external(spark, registry):
    rw = _fake_rw({})
    gs = Geostore(registry, external_resolvers={"rw": rw})
    entry = gs.create(SQUARE)
    got = gs.get(spark, entry["gfw_geostore_id"])
    assert got["gfw_geostore_id"] == entry["gfw_geostore_id"]
    assert rw.calls == []


def test_external_fallback_hit(spark, registry):
    record = {
        "gfw_geostore_id": "ext-1",
        "gfw_geojson": '{"type": "Point", "coordinates": [1.0, 2.0]}',
        "gfw_area__ha": 0.0,
        "gfw_bbox": [1.0, 2.0, 1.0, 2.0],
    }
    gs = Geostore(registry, external_resolvers={"rw": _fake_rw({"ext-1": record})})
    assert gs.get(spark, "ext-1") == record
    assert gs.geometry(spark, "ext-1")["type"] == "Point"


def test_origin_order_client_choice_first(spark, registry):
    """origin='rw' asks the external service before the local store."""
    rw = _fake_rw({})
    gs = Geostore(registry, external_resolvers={"rw": rw})
    entry = gs.create(SQUARE)
    got = gs.get(spark, entry["gfw_geostore_id"], origin="rw")
    assert got["gfw_geostore_id"] == entry["gfw_geostore_id"]
    assert rw.calls == [entry["gfw_geostore_id"]]  # rw consulted first, missed


def test_404_only_after_all_sources_miss(spark, registry):
    rw = _fake_rw({})
    gs = Geostore(registry, external_resolvers={"rw": rw})
    with pytest.raises(RegistryError) as err:
        gs.get(spark, "nope")
    assert err.value.status_code == 404
    assert rw.calls == ["nope"]  # the external source WAS consulted


def test_source_error_is_500_not_404(spark, registry):
    def broken(geostore_id):
        raise ConnectionError("rw-api unreachable")

    gs = Geostore(registry, external_resolvers={"rw": broken})
    with pytest.raises(RegistryError) as err:
        gs.get(spark, "nope")
    assert err.value.status_code == 500
    assert "rw-api unreachable" in str(err.value)
