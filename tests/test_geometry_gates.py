"""Round-5 geometry hard gates (q27/e11/e12/r09): the planted-analytic-
fixture pattern applied to Q4/E5/E7/R9.

The oracle pairs rest on two facts these tests pin down:

1. CPython's libm and DuckDB's produce BIT-IDENTICAL sin/tan/ln/radians
   in this container (both link the system libm) — probed explicitly so
   an environment change fails loudly here, not as a mystery hash
   mismatch in the driver gate.
2. The planted fixtures keep every comparison away from float hazards:
   coordinates are exact dyadic rationals, no point sits within 0.25° of
   a boundary, and rectangle areas reduce to two nonzero edge terms the
   oracle mirrors op-for-op.
"""

from __future__ import annotations

import math
import struct

import os

import pytest
from pyspark.sql import functions as F

# same env override conftest.py honors (tests/ is not a package, so the
# constant cannot be imported from conftest directly)
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _bits(x: float) -> str:
    return struct.pack("<d", x).hex()


def test_duckdb_cpython_libm_bit_identity():
    """The e11/e12 oracles mirror Python float expressions in DuckDB SQL;
    that is only exact if both engines' sin/tan/ln/radians round
    identically. Probe the full planted domain."""
    import duckdb

    con = duckdb.connect()
    for deg in [-89.75, -85.05112878, -80.0, -0.25, 0.25, 37.5, 69.0, 74.0, 85.05112878, 89.75]:
        d_rad = con.execute("SELECT radians(?)", [deg]).fetchone()[0]
        assert _bits(d_rad) == _bits(math.radians(deg)), f"radians({deg})"
        d_sin = con.execute("SELECT sin(radians(?))", [deg]).fetchone()[0]
        assert _bits(d_sin) == _bits(math.sin(math.radians(deg))), f"sin({deg})"
        if abs(deg) <= 85.06:
            d_y = con.execute(
                "SELECT ln(tan(pi() / 4.0 + radians(?) / 2.0))", [deg]
            ).fetchone()[0]
            p_y = math.log(math.tan(math.pi / 4.0 + math.radians(deg) / 2.0))
            assert _bits(d_y) == _bits(p_y), f"mercator-y({deg})"
    assert _bits(con.execute("SELECT pi()").fetchone()[0]) == _bits(math.pi)


def test_q27_boundary_margin():
    """No planted point may sit on (or within eps of) the query box
    boundary — membership must be unambiguous in both engines."""
    for k in range(1, 4000):
        lon = (k * 13 % 720) / 2.0 - 180.0 + 0.25
        lat = (k * 7 % 360) / 2.0 - 90.0 + 0.25
        for edge in (-30.0, 40.0):
            assert abs(lon - edge) >= 0.25
        for edge in (-20.0, 25.0):
            assert abs(lat - edge) >= 0.25


def test_q27_drives_bbox_prefilter_and_exact_predicate(spark):
    """The guarded path must run BOTH Q4 stages: the JVM bbox prefilter
    (visible in the plan as the gfw_bbox conjunct) and the exact
    intersects pandas UDF."""
    from gfw_data_api_spark.inventory import SPECS

    df = SPECS["q27_spatial_filter_box"].spark_fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Catalyst constant-folds the gfw_bbox array prefilter into scalar
    # lon/lat comparisons that run in codegen BEFORE the Python stage —
    # the prune must sit below ArrowEvalPython in the plan text
    assert "st_intersects_wkb" in plan
    python_at = plan.index("ArrowEvalPython")
    prune_at = plan.rindex("<= 40.0")
    assert prune_at > python_at, "bbox prune did not run before the exact UDF"


def test_e11_area_matches_closed_form(spark):
    """The spherical ring formula on an axis-aligned rectangle equals the
    lat-band closed form R²·Δλ·(sin φ₂ − sin φ₁) to float tolerance —
    the independent cross-check that the mirrored oracle expression is
    the RIGHT arithmetic, not just the same arithmetic."""
    from gfw_data_api_spark.inventory import SPECS

    rows = SPECS["e11_gfw_area_geodesic"].spark_fn(spark, SF_DIR).collect()
    assert len(rows) >= 10
    R = 6371008.8
    for r in rows:
        w = r.xmax - r.xmin
        expected = abs(
            R * R * math.radians(w)
            * (math.sin(math.radians(r.ymax)) - math.sin(math.radians(r.ymin)))
        ) / 10_000.0
        assert r.area_ha == pytest.approx(expected, rel=1e-9)
        assert r.area_ha > 0


def test_e12_clip_executes_on_real_rows(spark):
    """Planted latitudes reach ±89.75°, so the ±85.05112878° clip must
    fire: every |y| is bounded by the mercator y of the clip latitude."""
    from gfw_data_api_spark.inventory import SPECS

    rows = SPECS["e12_web_mercator_forward"].spark_fn(spark, SF_DIR).collect()
    y_max = 6378137.0 * math.log(
        math.tan(math.pi / 4.0 + math.radians(85.05112878) / 2.0)
    )
    assert max(abs(r.y_m) for r in rows) <= y_max + 1e-6
    # and some row actually hit the clamp (lat beyond the clip latitude)
    clipped = [r for r in rows if abs(r.y_m - y_max) < 1e-3 or abs(r.y_m + y_max) < 1e-3]
    assert clipped, "no planted point exercised the latitude clip"


def test_r09_exercises_full_and_partial_paths(spark):
    """The planted box must classify tile 10N_000E as FULL (fast path —
    every one of its pixels survives with no pip test) and the others as
    partial. Verified against plain-Python membership."""
    from gfw_data_api_spark.functions import geometry as geo
    from gfw_data_api_spark.inventory import SPECS
    from gfw_data_api_spark.raster.grid import Grid

    geometry = {
        "type": "Polygon",
        "coordinates": [
            [[-0.5, -0.5], [15.5, -0.5], [15.5, 10.5], [-0.5, 10.5], [-0.5, -0.5]]
        ],
    }
    grid = Grid.parse("10/40")
    tiles = grid.tiles_overlapping(geo.bbox(geometry))
    assert "10N_000E" in tiles and len(tiles) == 9

    rows = {r.tile_id: r for r in SPECS["r09_geometry_clip"].spark_fn(spark, SF_DIR).collect()}
    # full tile: every planted pixel id for that tile survives
    assert rows["10N_000E"].min_lat > 0.0 and rows["10N_000E"].max_lat < 10.0
    # partial-by-longitude tile: clipped at the 15.5 box edge (planted
    # lons for this tile reach 19.875, so survivors prove the clip ran)
    assert rows["10N_010E"].max_lon < 15.5
    assert rows["10N_010E"].max_lon > 14.0
    # partial-by-latitude tile: only the two southernmost rows survive
    assert rows["20N_000E"].max_lat < 10.5
    assert rows["20N_000E"].min_lat > 10.0
    # corner tile: clipped on both axes
    assert rows["20N_010E"].max_lon < 15.5 and rows["20N_010E"].max_lat < 10.5
