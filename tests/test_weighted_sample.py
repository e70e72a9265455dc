"""Tests for A-ES weighted sampling (llmops/sampling.py, gate w03)."""

import math

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.sampling import weighted_sample_without_replacement


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, w double")


def test_matches_independent_python_reference(spark):
    import hashlib

    rows = [(i, float(i % 7 + 1)) for i in range(1, 200)]
    got = {
        r.doc_id
        for r in weighted_sample_without_replacement(
            _df(spark, rows), k=25, weight_col="w", seed=3
        ).collect()
    }

    def key(i, w):
        # the canonical portable payload: value || chr(31) || seed
        h = int(hashlib.md5(f"{i}\x1f3".encode()).hexdigest()[:15], 16)
        return math.log((h + 1) / 2**60) / w

    want = {i for i, w in sorted(rows, key=lambda t: -key(*t))[:25]}
    assert got == want


def test_deterministic_across_partitionings_and_seed_sensitive(spark):
    rows = [(i, float(i % 5 + 1)) for i in range(1, 300)]
    a = {r.doc_id for r in weighted_sample_without_replacement(_df(spark, rows), 30, "w").collect()}
    b = {
        r.doc_id
        for r in weighted_sample_without_replacement(
            _df(spark, rows).repartition(13), 30, "w"
        ).collect()
    }
    assert a == b
    c = {
        r.doc_id
        for r in weighted_sample_without_replacement(
            _df(spark, rows), 30, "w", seed=1
        ).collect()
    }
    assert a != c


def test_weights_bias_selection(spark):
    # two strata: weight 100 vs weight 1 — the heavy stratum must dominate
    rows = [(i, 100.0 if i % 2 == 0 else 1.0) for i in range(1, 401)]
    got = [
        r.doc_id
        for r in weighted_sample_without_replacement(_df(spark, rows), 50, "w").collect()
    ]
    heavy = sum(1 for i in got if i % 2 == 0)
    assert heavy >= 40


def test_nonpositive_null_and_nan_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None), (5, float("nan"))],
        "doc_id bigint, w double",
    )
    got = weighted_sample_without_replacement(df, 10, "w").collect()
    # NaN sorts above every double in Spark — it must be screened, not win
    assert [r.doc_id for r in got] == [1]
    with pytest.raises(ValueError, match="k must be positive"):
        weighted_sample_without_replacement(df, 0, "w")


def test_plan_is_take_ordered_not_global_sort(spark):
    rows = [(i, 1.0) for i in range(1, 50)]
    plan = (
        weighted_sample_without_replacement(_df(spark, rows), 5, "w")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrdered" in plan
