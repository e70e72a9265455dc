"""Distributed spatial join vs a brute-force golden."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.functions import geometry as geo
from gfw_data_api_spark.operators.spatial_join import spatial_join


def _boxes_df(spark, name, boxes):
    rows = [
        (
            i,
            geo.wkb_dumps(
                {
                    "type": "Polygon",
                    "coordinates": [
                        [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                    ],
                }
            ),
            [x0, y0, x1, y1],
        )
        for i, (x0, y0, x1, y1) in enumerate(boxes)
    ]
    return spark.createDataFrame(rows, f"{name} bigint, geom binary, gfw_bbox array<double>")


@pytest.fixture(scope="module")
def random_boxes():
    rng = np.random.default_rng(13)
    def make(n, size):
        out = []
        for _ in range(n):
            x, y = rng.uniform(0, 20), rng.uniform(0, 20)
            w, h = rng.uniform(0.1, size), rng.uniform(0.1, size)
            out.append((x, y, x + w, y + h))
        return out
    return make(60, 2.0), make(40, 3.0)


def test_spatial_join_matches_bruteforce(spark, random_boxes):
    left_boxes, right_boxes = random_boxes
    left = _boxes_df(spark, "lid", left_boxes)
    right = _boxes_df(spark, "rid", right_boxes)
    got = {
        (r["lid"], r["rid"])
        for r in spatial_join(left, right, "lid", "rid", cell_deg=1.0).collect()
    }
    golden = set()
    for i, a in enumerate(left_boxes):
        for j, b in enumerate(right_boxes):
            if not (a[2] < b[0] or b[2] < a[0] or a[3] < b[1] or b[3] < a[1]):
                golden.add((i, j))  # axis-aligned boxes: bbox overlap == intersects
    assert got == golden
    assert len(golden) > 20  # non-trivial overlap structure


def test_spatial_join_cell_size_invariance(spark, random_boxes):
    """The result must not depend on the bucketing granularity."""
    left_boxes, right_boxes = random_boxes
    left = _boxes_df(spark, "lid", left_boxes)
    right = _boxes_df(spark, "rid", right_boxes)
    fine = {
        (r["lid"], r["rid"])
        for r in spatial_join(left, right, "lid", "rid", cell_deg=0.5).collect()
    }
    coarse = {
        (r["lid"], r["rid"])
        for r in spatial_join(left, right, "lid", "rid", cell_deg=5.0).collect()
    }
    assert fine == coarse


def test_spatial_join_left_semi(spark, random_boxes):
    left_boxes, right_boxes = random_boxes
    left = _boxes_df(spark, "lid", left_boxes)
    right = _boxes_df(spark, "rid", right_boxes)
    pairs = spatial_join(left, right, "lid", "rid").select("lid").distinct()
    semi = spatial_join(left, right, "lid", "rid", how="left_semi")
    assert {r["lid"] for r in semi.collect()} == {r["lid"] for r in pairs.collect()}


def test_spatial_join_no_cartesian_in_plan(spark, random_boxes):
    left_boxes, right_boxes = random_boxes
    left = _boxes_df(spark, "lid", left_boxes)
    right = _boxes_df(spark, "rid", right_boxes)
    df = spatial_join(left, right, "lid", "rid")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
