"""Grouped percentiles operator (operators/percentiles.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.operators.percentiles import grouped_percentiles


def test_approx_percentile_error_bound(spark):
    # 3 groups x 50k rows of known uniform values: approx p50/p90 must be
    # within the GK rank-error bound (1/accuracy of group size) of exact
    rows = [(g, float(i)) for g in ("a", "b", "c") for i in range(50_000)]
    df = spark.createDataFrame(rows, "grp string, v double").repartition(16)
    approx = grouped_percentiles(
        df, ["grp"], {"p50": ("v", 0.5), "p90": ("v", 0.9)}, accuracy=10_000
    )
    exact = grouped_percentiles(
        df, ["grp"], {"e50": ("v", 0.5), "e90": ("v", 0.9)}, exact=True
    )
    joined = {r["grp"]: r for r in approx.join(exact, "grp").collect()}
    n = 50_000
    tol = n / 10_000 + 1  # rank error -> value error (values are ranks here)
    for g in ("a", "b", "c"):
        r = joined[g]
        assert abs(r["p50"] - r["e50"]) <= tol
        assert abs(r["p90"] - r["e90"]) <= tol


def test_exact_matches_sql_percentile(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0)], "grp string, v double"
    )
    out = grouped_percentiles(df, ["grp"], {"p25": ("v", 0.25)}, exact=True).collect()
    assert out[0]["p25"] == pytest.approx(1.75)  # interpolated like PG


def test_bad_fraction_raises(spark):
    df = spark.createDataFrame([("a", 1.0)], "grp string, v double")
    with pytest.raises(ValueError):
        grouped_percentiles(df, ["grp"], {"p": ("v", 1.5)})
