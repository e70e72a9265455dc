"""Web-mercator warp (raster/warp.py) vs NumPy-golden slippy-map math."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.raster.grid import Grid
from gfw_data_api_spark.raster.pixels import tile_set_from_array
from gfw_data_api_spark.raster.warp import mercator_pyramid, reproject_to_mercator


def _slippy(lon: float, lat: float, zoom: int, tile_px: int = 256) -> tuple[int, int]:
    world = (1 << zoom) * tile_px
    gx = int((lon + 180.0) / 360.0 * world)
    merc = math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))
    gy = int((1.0 - merc / math.pi) / 2.0 * world)
    return gx, gy


@pytest.fixture(scope="module")
def equator_tile(spark):
    # 10° tile at 10N_000E (lat 0..10, lon 0..10), 40×40 px, all value 5
    grid = Grid.parse("10/40")
    arr = np.full((40, 40), 5.0)
    return grid, tile_set_from_array(spark, grid, "10N_000E", arr, no_data=0)


def test_warp_placement_golden(equator_tile):
    grid, px = equator_tile
    out = reproject_to_mercator(px, grid, zoom=2, method="avg").collect()
    # lat 0..10, lon 0..10 at z2 (1024px world): all in tile (2,1)
    assert {(r["tile_x"], r["tile_y"]) for r in out} == {(2, 1)}
    # golden position of the tile's NW pixel center (lat≈9.875, lon≈0.125)
    gx, gy = _slippy(0.125, 9.875, 2)
    want_pid = (gy % 256) * 256 + (gx % 256)
    assert any(r["pixel_id"] == want_pid for r in out)
    assert all(r["value"] == 5.0 for r in out)


def test_warp_conserves_sum(equator_tile):
    grid, px = equator_tile
    src_sum = px.agg(F.sum("value")).collect()[0][0]
    out = reproject_to_mercator(px, grid, zoom=2, method="sum")
    warped_sum = out.agg(F.sum("value")).collect()[0][0]
    assert warped_sum == pytest.approx(src_sum)


def test_warp_methods_agree_on_constant(equator_tile):
    grid, px = equator_tile
    for method in ("avg", "min", "max", "nearest"):
        vals = {
            r["value"]
            for r in reproject_to_mercator(px, grid, zoom=1, method=method).collect()
        }
        assert vals == {5.0}, method


def test_warp_count_matches_footprint(equator_tile):
    grid, px = equator_tile
    out = reproject_to_mercator(px, grid, zoom=2, method="count")
    # counts sum to the number of source pixels
    assert out.agg(F.sum("value")).collect()[0][0] == 1600


def test_pyramid_levels(equator_tile):
    grid, px = equator_tile
    pyr = mercator_pyramid(px, grid, 0, 2, method="avg")
    assert sorted(pyr) == [0, 1, 2]
    n0 = pyr[0].count()
    n2 = pyr[2].count()
    assert n0 < n2  # coarser level has fewer occupied cells
    for z, df in pyr.items():
        assert {(r["tile_x"], r["tile_y"]) for r in df.select("tile_x", "tile_y").distinct().collect()} <= {
            (x, y) for x in range(1 << z) for y in range(1 << z)
        }


def test_warp_no_python_udf(equator_tile):
    grid, px = equator_tile
    plan = (
        reproject_to_mercator(px, grid, zoom=2, method="avg")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_raster_tile_cache_renders_png_tiles(spark):
    """z/x/y PNG tiles: warp → colormap → render, decoded back pixel-exact."""
    from gfw_data_api_spark.llmops.multimodal import decode_png
    from gfw_data_api_spark.raster.tile_cache import raster_tile_cache

    grid = Grid.parse("10/40")
    arr = np.full((40, 40), 5.0)
    px = tile_set_from_array(spark, grid, "10N_000E", arr, no_data=0)
    tiles = raster_tile_cache(
        px, grid, {5.0: (200, 30, 40)}, min_zoom=1, max_zoom=2
    ).collect()
    by_key = {(r["z"], r["x"], r["y"]): r["png"] for r in tiles}
    # lat 0..10, lon 0..10 lands in tile (2,1) at z2 and (1,0) at z1
    assert (2, 2, 1) in by_key and (1, 1, 0) in by_key
    img = decode_png(bytes(by_key[(2, 2, 1)]))
    assert img.shape == (256, 256, 4)
    gx, gy = _slippy(0.125, 9.875, 2)
    pyx = (gy % 256, gx % 256)
    assert img[pyx[0], pyx[1]].tolist() == [200, 30, 40, 255]  # painted pixel
    assert img[255, 255].tolist() == [0, 0, 0, 0]  # outside extent: transparent
    # alpha channel marks exactly the warped pixels
    assert (img[:, :, 3] == 255).sum() > 0


def test_raster_tile_cache_zoom_validation(spark):
    import pytest as _pytest

    from gfw_data_api_spark.raster.tile_cache import raster_tile_cache

    grid = Grid.parse("10/40")
    px = tile_set_from_array(spark, grid, "10N_000E", np.ones((40, 40)), no_data=0)
    with _pytest.raises(ValueError):
        raster_tile_cache(px, grid, {1.0: (0, 0, 0)}, min_zoom=3, max_zoom=2)
