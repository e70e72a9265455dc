"""Raster engine tests: grid math, pixel materialization, data environment,
derived layers, and the OTF zonal query path against hand-computed NumPy
goldens (FIXTURES.md §5; reference golden strings in
tests_v2/unit/app/routes/datasets/test_query.py:522-585)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.catalog import Registry
from gfw_data_api_spark.functions.geometry import EARTH_RADIUS_M
from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.ingest import ingest_raster_tiles
from gfw_data_api_spark.raster.zonal import query_raster
from gfw_data_api_spark.sql.guard import QueryGuardError

GRID = Grid(1.0, 100)  # 1° tiles, 0.01° pixels, 10k px per tile
N = GRID.pixels_per_side
TILE = "01N_010E"  # covers lat [0,1), lon [10,11)


def pixel_lats():
    return 1.0 - (np.arange(N) + 0.5) * GRID.pixel_size


def pixel_lons():
    return 10.0 + (np.arange(N) + 0.5) * GRID.pixel_size


def area_ha_vec(lat):
    half = GRID.pixel_size / 2.0
    dlon = np.radians(GRID.pixel_size)
    return np.abs(
        EARTH_RADIUS_M**2 * dlon * (np.sin(np.radians(lat + half)) - np.sin(np.radians(lat - half)))
    ) / 1e4


@pytest.fixture(scope="module")
def fixture_arrays():
    rng = np.random.default_rng(7)
    year = rng.choice([0, 0, 0, 2001, 2005, 2010, 2015, 2020], size=(N, N)).astype(np.float64)
    threshold = rng.choice([0, 10, 25, 30, 50, 75], size=(N, N)).astype(np.float64)
    biomass = rng.uniform(0, 300, size=(N, N)).round(3)
    biomass[rng.random((N, N)) < 0.3] = 0.0  # no_data
    conf = rng.choice([2, 3, 4], size=(N, N)).astype(np.float64)
    days = rng.integers(1, 2000, size=(N, N)).astype(np.float64)
    date_conf = conf * 10000 + days
    date_conf[rng.random((N, N)) < 0.2] = 0.0
    return {"year": year, "threshold": threshold, "biomass": biomass, "date_conf": date_conf}


@pytest.fixture(scope="module")
def raster_registry(spark, tmp_path_factory, fixture_arrays):
    registry = Registry(str(tmp_path_factory.mktemp("raster_catalog")))
    ingest_raster_tiles(
        registry, spark, "umd_tree_cover_loss", "v1", GRID, "year",
        {TILE: fixture_arrays["year"]},
    )
    ingest_raster_tiles(
        registry, spark, "umd_tree_cover_density_2000", "v1", GRID, "threshold",
        {TILE: fixture_arrays["threshold"]},
    )
    ingest_raster_tiles(
        registry, spark, "whrc_aboveground_biomass_stock_2000", "v1", GRID, "Mg_ha-1",
        {TILE: fixture_arrays["biomass"]},
    )
    ingest_raster_tiles(
        registry, spark, "my_first_dataset", "v1", GRID, "date_conf",
        {TILE: fixture_arrays["date_conf"]},
    )
    return registry


AOI = {
    "type": "Polygon",
    "coordinates": [[[10.2, 0.3], [10.7, 0.3], [10.7, 0.8], [10.2, 0.8], [10.2, 0.3]]],
}


def aoi_mask():
    lats, lons = pixel_lats(), pixel_lons()
    in_lat = (lats >= 0.3) & (lats <= 0.8)
    in_lon = (lons >= 10.2) & (lons <= 10.7)
    return np.outer(in_lat, in_lon)


# ---------------------------------------------------------------------------
# grid math
# ---------------------------------------------------------------------------


def test_grid_parse_roundtrip():
    grid = Grid.parse("10/40000")
    assert grid.tile_deg == 10.0 and grid.pixels_per_side == 40000
    assert grid.pixel_size == pytest.approx(0.00025)
    assert grid.name == "10/40000"


def test_tile_id_math():
    assert Grid.format_tile_id(10, -20) == "10N_020W"
    assert Grid.parse_tile_id("10N_020W") == (10.0, -20.0)
    grid = Grid(10.0, 100)
    assert grid.tile_id_for(5.0, 15.0) == "10N_010E"
    assert grid.tile_id_for(-5.0, -15.0) == "00N_020W"


def test_tiles_overlapping():
    grid = Grid(1.0, 100)
    tiles = grid.tiles_overlapping((10.2, 0.3, 11.5, 1.5))
    assert "01N_010E" in tiles and "02N_011E" in tiles
    assert len(tiles) == 4


# ---------------------------------------------------------------------------
# zonal queries vs NumPy goldens
# ---------------------------------------------------------------------------


def test_count_pixels_in_aoi(spark, raster_registry, fixture_arrays):
    rows = query_raster(
        spark, raster_registry, "umd_tree_cover_loss", "v1",
        "SELECT count(*) AS n FROM data", AOI,
    ).collect()
    golden = int(((fixture_arrays["year"] != 0) & aoi_mask()).sum())
    assert rows[0]["n"] == golden


def test_zonal_area_by_year_with_threshold(spark, raster_registry, fixture_arrays):
    rows = query_raster(
        spark, raster_registry, "umd_tree_cover_loss", "v1",
        "SELECT umd_tree_cover_loss__year AS year, sum(area__ha) AS area "
        "FROM data WHERE umd_tree_cover_density_2000__threshold >= 30 "
        "GROUP BY umd_tree_cover_loss__year", AOI,
    ).collect()
    year, threshold = fixture_arrays["year"], fixture_arrays["threshold"]
    areas = np.broadcast_to(area_ha_vec(pixel_lats())[:, None], year.shape)
    base = (year != 0) & (threshold >= 30) & aoi_mask()
    golden = {
        int(y): float(areas[base & (year == y)].sum()) for y in np.unique(year[base])
    }
    assert len(rows) == len(golden)
    for row in rows:
        assert row["area"] == pytest.approx(golden[int(row["year"])], rel=1e-9)


def test_confidence_decode_group(spark, raster_registry, fixture_arrays):
    rows = query_raster(
        spark, raster_registry, "my_first_dataset", "v1",
        "SELECT my_first_dataset__confidence AS conf, count(*) AS n "
        "FROM data GROUP BY my_first_dataset__confidence", AOI,
    ).collect()
    dc = fixture_arrays["date_conf"]
    valid = (dc != 0) & aoi_mask()
    meanings = {2: "nominal", 3: "high", 4: "highest"}
    golden = {
        meanings[int(c)]: int((valid & (np.floor(dc / 10000) == c)).sum())
        for c in (2, 3, 4)
    }
    assert {r["conf"]: r["n"] for r in rows} == golden


def test_date_decode_filter(spark, raster_registry, fixture_arrays):
    rows = query_raster(
        spark, raster_registry, "my_first_dataset", "v1",
        "SELECT count(*) AS n FROM data WHERE my_first_dataset__date >= '2018-01-01'", AOI,
    ).collect()
    dc = fixture_arrays["date_conf"]
    days = np.mod(dc, 10000)
    # 2018-01-01 is 1096 days after 2015-01-01
    golden = int(((dc != 0) & aoi_mask() & (days >= 1096)).sum())
    assert rows[0]["n"] == golden


def test_co2_predefined_layer(spark, raster_registry, fixture_arrays):
    rows = query_raster(
        spark, raster_registry, "whrc_aboveground_biomass_stock_2000", "v1",
        "SELECT sum(whrc_aboveground_co2_emissions__Mg) AS co2 FROM data", AOI,
    ).collect()
    biomass = fixture_arrays["biomass"]
    areas = np.broadcast_to(area_ha_vec(pixel_lats())[:, None], biomass.shape)
    valid = (biomass != 0) & aoi_mask()
    golden = float((biomass * areas * (0.5 * 44 / 12))[valid].sum())
    assert rows[0]["co2"] == pytest.approx(golden, rel=1e-9)


def test_area_density_gross_layer(spark, raster_registry, fixture_arrays):
    rows = query_raster(
        spark, raster_registry, "whrc_aboveground_biomass_stock_2000", "v1",
        "SELECT sum(whrc_aboveground_biomass_stock_2000__Mg) AS mg FROM data", AOI,
    ).collect()
    biomass = fixture_arrays["biomass"]
    areas = np.broadcast_to(area_ha_vec(pixel_lats())[:, None], biomass.shape)
    valid = (biomass != 0) & aoi_mask()
    golden = float((biomass * areas)[valid].sum())
    assert rows[0]["mg"] == pytest.approx(golden, rel=1e-9)


def test_geometry_type_rejected(spark, raster_registry):
    with pytest.raises(QueryGuardError) as exc:
        query_raster(
            spark, raster_registry, "umd_tree_cover_loss", "v1",
            "SELECT count(*) AS n FROM data",
            {"type": "Point", "coordinates": [10.5, 0.5]},
        )
    assert exc.value.status_code == 422


def test_area_cap_rejected(spark, raster_registry):
    huge = {
        "type": "Polygon",
        "coordinates": [[[-179, -80], [179, -80], [179, 80], [-179, 80], [-179, -80]]],
    }
    with pytest.raises(QueryGuardError) as exc:
        query_raster(
            spark, raster_registry, "umd_tree_cover_loss", "v1",
            "SELECT count(*) AS n FROM data", huge,
        )
    assert exc.value.status_code == 400


def test_version_override(spark, raster_registry, fixture_arrays):
    """R11: swap a layer's version in the environment."""
    doubled = fixture_arrays["threshold"] * 0 + 75.0
    ingest_raster_tiles(
        raster_registry, spark, "umd_tree_cover_density_2000", "v2", GRID, "threshold",
        {TILE: doubled}, make_latest=True,
    )
    from gfw_data_api_spark.raster.data_environment import clear_cache

    clear_cache()
    sql = (
        "SELECT count(*) AS n FROM data WHERE umd_tree_cover_density_2000__threshold >= 30"
    )
    with_latest = query_raster(
        spark, raster_registry, "umd_tree_cover_loss", "v1", sql, AOI
    ).collect()[0]["n"]
    with_v1 = query_raster(
        spark, raster_registry, "umd_tree_cover_loss", "v1", sql, AOI,
        version_overrides={"umd_tree_cover_density_2000": "v1"},
    ).collect()[0]["n"]
    year = fixture_arrays["year"]
    golden_latest = int(((year != 0) & aoi_mask()).sum())  # all thresholds 75 now
    golden_v1 = int(((year != 0) & (fixture_arrays["threshold"] >= 30) & aoi_mask()).sum())
    assert with_latest == golden_latest
    assert with_v1 == golden_v1


def test_sum_alert_count_rewrite(spark, raster_registry, fixture_arrays):
    """analysis.py:147 — sum(alert__count) → count(*)."""
    rows = query_raster(
        spark, raster_registry, "umd_tree_cover_loss", "v1",
        "SELECT sum(alert__count) AS alert__count FROM data", AOI,
    ).collect()
    golden = int(((fixture_arrays["year"] != 0) & aoi_mask()).sum())
    assert rows[0]["alert__count"] == golden


def test_avg_min_max_over_layers(spark, raster_registry, fixture_arrays):
    """R3: any aggregate passes through to the zonal engine."""
    rows = query_raster(
        spark, raster_registry, "umd_tree_cover_loss", "v1",
        "SELECT avg(umd_tree_cover_loss__year) AS avg_year, "
        "min(umd_tree_cover_loss__year) AS min_year, "
        "max(umd_tree_cover_loss__year) AS max_year FROM data", AOI,
    ).collect()
    year = fixture_arrays["year"]
    valid = year[(year != 0) & aoi_mask()]
    assert rows[0]["avg_year"] == pytest.approx(float(valid.mean()), rel=1e-12)
    assert rows[0]["min_year"] == valid.min()
    assert rows[0]["max_year"] == valid.max()


def test_date_encode_decode_roundtrip():
    """Reference parity: encode/decode round-trip (test_query.py:845-864)."""
    from gfw_data_api_spark.raster.layers import decode_date, encode_date

    for date in ("2015-01-01", "2018-06-15", "2024-12-31"):
        assert decode_date(encode_date(date)) == date
    assert encode_date("2015-01-01") == 0
    assert encode_date("2018-01-01") == 1096


def test_spark_date_decode_matches_python(spark, raster_registry, fixture_arrays):
    """The Spark-side date decoding equals the Python reference decode."""
    from gfw_data_api_spark.raster.layers import decode_date

    rows = query_raster(
        spark, raster_registry, "my_first_dataset", "v1",
        "SELECT my_first_dataset__date AS d, count(*) AS n FROM data GROUP BY 1", AOI,
    ).collect()
    dc = fixture_arrays["date_conf"]
    valid = (dc != 0) & aoi_mask()
    days = np.mod(dc[valid], 10000).astype(int)
    golden = {}
    for day in days:
        key = decode_date(int(day))
        golden[key] = golden.get(key, 0) + 1
    assert {r["d"]: r["n"] for r in rows} == golden


def test_aoi_with_hole_inside_full_tile(spark, raster_registry, fixture_arrays):
    """A polygon hole entirely inside a tile must not be swallowed by the
    full-tile masking shortcut."""
    donut = {
        "type": "Polygon",
        "coordinates": [
            # outer covers the whole tile and beyond
            [[9.5, -0.5], [11.5, -0.5], [11.5, 1.5], [9.5, 1.5], [9.5, -0.5]],
            # hole strictly inside the tile
            [[10.4, 0.4], [10.6, 0.4], [10.6, 0.6], [10.4, 0.6], [10.4, 0.4]],
        ],
    }
    rows = query_raster(
        spark, raster_registry, "umd_tree_cover_loss", "v1",
        "SELECT count(*) AS n FROM data", donut,
    ).collect()
    year = fixture_arrays["year"]
    lats, lons = pixel_lats(), pixel_lons()
    in_hole = np.outer((lats > 0.4) & (lats < 0.6), (lons > 10.4) & (lons < 10.6))
    golden = int(((year != 0) & ~in_hole).sum())
    assert rows[0]["n"] == golden
