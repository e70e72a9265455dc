"""Zonal-analysis SQL generation (analysis.py parity) + batch list query."""

import numpy as np
import pytest

from gfw_data_api_spark.catalog import Registry
from gfw_data_api_spark.operators.analysis import generate_zonal_sql, zonal_statistics
from gfw_data_api_spark.raster.batch import batch_query
from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.ingest import ingest_raster_tiles

GRID = Grid(1.0, 100)
N = 100
TILE = "01N_010E"


def test_generate_zonal_sql_matrix():
    # plain sum
    assert generate_zonal_sql(["area__ha"]) == "select sum(area__ha) from data"
    # TCD threshold translation (analysis.py:115-121)
    sql = generate_zonal_sql(["area__ha"], filters=["umd_tree_cover_density_2000__30"])
    assert sql == (
        "select sum(area__ha) from data where umd_tree_cover_density_2000__threshold >= 30"
    )
    # boolean layer filter
    sql = generate_zonal_sql(["area__ha"], filters=["is__umd_regional_primary_forest_2001"])
    assert "is__umd_regional_primary_forest_2001 != 'false'" in sql
    # group by + dates bound to the date layer
    sql = generate_zonal_sql(
        ["alert__count"],
        group_by=["umd_glad_landsat_alerts__date"],
        start_date="2021-01-01",
        end_date="2021-06-30",
    )
    assert sql == (
        "select count(*) from data where umd_glad_landsat_alerts__date >= '2021-01-01' "
        "and umd_glad_landsat_alerts__date <= '2021-06-30' "
        "group by umd_glad_landsat_alerts__date"
    )
    # deprecated rename (analysis.py:141-146)
    sql = generate_zonal_sql(["alert__count"], group_by=["umd_glad_alerts__isoweek"])
    assert "isoweek(umd_glad_landsat_alerts__date)" in sql


@pytest.fixture(scope="module")
def registry(spark, tmp_path_factory):
    registry = Registry(str(tmp_path_factory.mktemp("ab_catalog")))
    rng = np.random.default_rng(11)
    year = rng.choice([0, 0, 2003, 2012, 2021], size=(N, N)).astype(np.float64)
    threshold = rng.choice([0, 10, 30, 75], size=(N, N)).astype(np.float64)
    ingest_raster_tiles(registry, spark, "umd_tree_cover_loss", "v1", GRID, "year", {TILE: year})
    ingest_raster_tiles(
        registry, spark, "umd_tree_cover_density_2000", "v1", GRID, "threshold", {TILE: threshold}
    )
    registry._arrays = {"year": year, "threshold": threshold}
    return registry


def test_zonal_statistics_endpoint(spark, registry):
    aoi = {
        "type": "Polygon",
        "coordinates": [[[10.1, 0.1], [10.9, 0.1], [10.9, 0.9], [10.1, 0.9], [10.1, 0.1]]],
    }
    df = zonal_statistics(
        spark, registry, "umd_tree_cover_loss", "v1", aoi,
        sum_layers=["area__ha"],
        group_by=["umd_tree_cover_loss__year"],
        filters=["umd_tree_cover_density_2000__30"],
    )
    rows = df.collect()
    assert len(rows) == 3  # 2003, 2012, 2021
    assert all(r["sum(area__ha)"] > 0 for r in rows)


def test_batch_query_per_feature(spark, registry):
    features = [
        {"type": "Polygon", "coordinates": [[[10.1, 0.1], [10.3, 0.1], [10.3, 0.3], [10.1, 0.3], [10.1, 0.1]]]},
        {"type": "Polygon", "coordinates": [[[10.6, 0.6], [10.9, 0.6], [10.9, 0.9], [10.6, 0.9], [10.6, 0.6]]]},
        {"type": "Point", "coordinates": [10.5, 0.5]},  # invalid for raster → failed
    ]
    result, failed = batch_query(
        spark, registry, "umd_tree_cover_loss", "v1",
        "SELECT count(*) AS n FROM data", features,
    )
    assert failed == [2]
    rows = {r["feature_id"]: r["n"] for r in result.collect()}
    assert set(rows) == {0, 1}

    year = registry._arrays["year"]
    lats = 1.0 - (np.arange(N) + 0.5) * GRID.pixel_size
    lons = 10.0 + (np.arange(N) + 0.5) * GRID.pixel_size

    def count_box(x0, y0, x1, y1):
        m = np.outer((lats >= y0) & (lats <= y1), (lons >= x0) & (lons <= x1))
        return int(((year != 0) & m).sum())

    assert rows[0] == count_box(10.1, 0.1, 10.3, 0.3)
    assert rows[1] == count_box(10.6, 0.6, 10.9, 0.9)


def test_batch_query_matches_single_queries(spark, registry):
    """The one-job batch path must equal N independent zonal queries."""
    from gfw_data_api_spark.raster.zonal import query_raster

    features = [
        {"type": "Polygon", "coordinates": [[[10.0, 0.0], [10.5, 0.0], [10.5, 0.5], [10.0, 0.5], [10.0, 0.0]]]},
        {"type": "Polygon", "coordinates": [[[10.4, 0.4], [10.8, 0.4], [10.8, 0.8], [10.4, 0.8], [10.4, 0.4]]]},
    ]
    sql = (
        "SELECT umd_tree_cover_loss__year AS yr, sum(area__ha) AS area FROM data "
        "GROUP BY umd_tree_cover_loss__year"
    )
    batch, _ = batch_query(spark, registry, "umd_tree_cover_loss", "v1", sql, features)
    batch_rows = {
        (r["feature_id"], int(r["yr"])): r["area"] for r in batch.collect()
    }
    for idx, feature in enumerate(features):
        single = query_raster(
            spark, registry, "umd_tree_cover_loss", "v1", sql, feature
        ).collect()
        for row in single:
            assert batch_rows[(idx, int(row["yr"]))] == pytest.approx(row["area"], rel=1e-12)


def test_batch_query_aggregate_with_order_by(spark, registry):
    """GROUP BY injection must land before an ORDER BY tail."""
    features = [
        {"type": "Polygon", "coordinates": [[[10.1, 0.1], [10.4, 0.1], [10.4, 0.4], [10.1, 0.4], [10.1, 0.1]]]},
        {"type": "Polygon", "coordinates": [[[10.5, 0.5], [10.9, 0.5], [10.9, 0.9], [10.5, 0.9], [10.5, 0.5]]]},
    ]
    result, failed = batch_query(
        spark, registry, "umd_tree_cover_loss", "v1",
        "SELECT count(*) AS n FROM data ORDER BY n", features,
    )
    assert failed == []
    assert {r["feature_id"] for r in result.collect()} == {0, 1}
