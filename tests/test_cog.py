"""COG writer/reader (raster/cog.py): container round-trips without GDAL,
pyramid structure, georeferencing, and tile-set assembly."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from gfw_data_api_spark.raster.cog import cog_from_tile_set, read_cog, write_cog


def _checker(h, w, dtype):
    a = np.indices((h, w)).sum(axis=0) % 7 + 1
    return a.astype(dtype)


def test_roundtrip_exact(tmp_path):
    a = _checker(300, 520, "uint16")
    path = str(tmp_path / "t.tif")
    info = write_cog(path, a, nw_lon=10.0, nw_lat=50.0, pixel_size=0.01, nodata=0)
    levels = read_cog(path)
    assert info["levels"] == len(levels)
    np.testing.assert_array_equal(levels[0]["array"], a)
    assert levels[0]["reduced"] is False
    assert levels[0]["nodata"] == 0.0
    assert levels[0]["pixel_scale"][0] == pytest.approx(0.01)
    # tiepoint: raster (0,0) ↔ (nw_lon, nw_lat)
    assert levels[0]["tiepoint"][3:5] == [10.0, 50.0]


@pytest.mark.parametrize("dtype", ["uint8", "int16", "int32", "float32", "float64"])
def test_roundtrip_dtypes(tmp_path, dtype):
    a = _checker(64, 64, dtype)
    path = str(tmp_path / f"{dtype}.tif")
    write_cog(path, a, nw_lon=0, nw_lat=0, pixel_size=0.1, nodata=0, tile_size=32)
    out = read_cog(path)[0]["array"]
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, a)


def test_overview_pyramid(tmp_path):
    a = _checker(1024, 1024, "uint8")
    path = str(tmp_path / "p.tif")
    info = write_cog(path, a, nw_lon=0, nw_lat=0, pixel_size=0.001, nodata=0)
    levels = read_cog(path)
    assert info["levels"] == 3  # 1024 → 512 → 256
    assert [lv["array"].shape for lv in levels] == [(1024, 1024), (512, 512), (256, 256)]
    assert [lv["reduced"] for lv in levels] == [False, True, True]
    # nearest 2×: overview == full[::2, ::2]
    np.testing.assert_array_equal(levels[1]["array"], a[::2, ::2])
    np.testing.assert_array_equal(levels[2]["array"], a[::4, ::4])


def test_cloud_optimized_layout(tmp_path):
    """IFDs at the file head; tile data smallest-overview-first."""
    a = _checker(1024, 1024, "uint8")
    path = str(tmp_path / "l.tif")
    write_cog(path, a, nw_lon=0, nw_lat=0, pixel_size=0.001, nodata=0)
    with open(path, "rb") as fh:
        buf = fh.read()
    (ifd0,) = struct.unpack_from("<I", buf, 4)
    assert ifd0 == 8  # first IFD directly after the header
    levels = read_cog(path)
    # reader exposes nothing about offsets; re-parse tag 324 per IFD
    offs = []
    off = ifd0
    while off:
        (n,) = struct.unpack_from("<H", buf, off)
        for i in range(n):
            tag, ttype, count = struct.unpack_from("<HHI", buf, off + 2 + 12 * i)
            if tag == 324:
                pos = off + 2 + 12 * i + 8
                if count == 1:
                    offs.append(struct.unpack_from("<I", buf, pos)[0])
                else:
                    (p,) = struct.unpack_from("<I", buf, pos)
                    offs.append(struct.unpack_from("<I", buf, p)[0])
        (off,) = struct.unpack_from("<I", buf, off + 2 + 12 * n)
    # first tile of the SMALLEST overview sits lowest in the file
    assert offs[-1] < offs[1] < offs[0]
    assert len(levels) == 3


def test_nodata_padding_not_leaked(tmp_path):
    """Edge tiles pad with nodata; the crop must remove the padding."""
    a = np.full((40, 70), 5, dtype="uint8")
    path = str(tmp_path / "pad.tif")
    write_cog(path, a, nw_lon=0, nw_lat=0, pixel_size=1.0, nodata=0, tile_size=32)
    out = read_cog(path)[0]["array"]
    assert out.shape == (40, 70)
    assert (out == 5).all()


def test_cog_from_tile_set(spark, tmp_path):
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.pixels import tile_set_from_array, write_tile_set

    grid = Grid.parse("10/40")  # 10° tiles, 40 px per side
    t1 = np.arange(1600, dtype="float32").reshape(40, 40) + 1
    t2 = np.full((40, 40), 7.0, dtype="float32")
    df = tile_set_from_array(spark, grid, "10N_010E", t1, no_data=0).unionByName(
        tile_set_from_array(spark, grid, "10N_020E", t2, no_data=0)
    )
    ts_path = str(tmp_path / "ts")
    write_tile_set(df, ts_path)
    out_path = str(tmp_path / "mosaic.tif")
    info = cog_from_tile_set(spark, ts_path, grid, out_path, nodata=0, dtype="float32")
    levels = read_cog(out_path)
    assert levels[0]["array"].shape == (40, 80)
    np.testing.assert_array_equal(levels[0]["array"][:, :40], t1)
    np.testing.assert_array_equal(levels[0]["array"][:, 40:], t2)
    # georef: NW corner of the mosaic = 10N, 10E
    assert levels[0]["tiepoint"][3:5] == [10.0, 10.0]
    assert info["bytes"] > 0


def test_cog_from_sparse_tile_set_preserves_gaps(spark, tmp_path):
    """Non-adjacent tiles must keep their geographic gap (review finding:
    compacting sorted-present coords placed tiles at wrong positions)."""
    from gfw_data_api_spark.raster.grid import Grid
    from gfw_data_api_spark.raster.pixels import tile_set_from_array, write_tile_set

    grid = Grid.parse("10/40")
    t_w = np.full((40, 40), 1.0, dtype="float32")
    t_e = np.full((40, 40), 2.0, dtype="float32")
    # 10E and 30E: one missing 10-degree column between them
    df = tile_set_from_array(spark, grid, "10N_010E", t_w, no_data=0).unionByName(
        tile_set_from_array(spark, grid, "10N_030E", t_e, no_data=0)
    )
    ts = str(tmp_path / "ts")
    write_tile_set(df, ts)
    out = str(tmp_path / "sparse.tif")
    cog_from_tile_set(spark, ts, grid, out, nodata=0, dtype="float32")
    arr = read_cog(out)[0]["array"]
    assert arr.shape == (40, 120)  # 3 tile columns incl. the gap
    np.testing.assert_array_equal(arr[:, :40], t_w)
    assert (arr[:, 40:80] == 0).all()  # the gap stays nodata
    np.testing.assert_array_equal(arr[:, 80:], t_e)
