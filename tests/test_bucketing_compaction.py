"""Bucketed co-located joins (sources/bucketing.py) and small-file
compaction (sources/compaction.py)."""

import uuid

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.sources.bucketing import cobucketed_join, write_bucketed
from gfw_data_api_spark.sources.compaction import (
    compact_parquet,
    measure_files,
    plan_compaction,
)


@pytest.fixture()
def two_bucketed_tables(spark):
    left = f"bkt_left_{uuid.uuid4().hex[:8]}"
    right = f"bkt_right_{uuid.uuid4().hex[:8]}"
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    other = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("w")
    )
    write_bucketed(facts, left, "k", 8, sort_cols="k")
    write_bucketed(other, right, "k", 8, sort_cols="k")
    yield left, right
    spark.sql(f"DROP TABLE IF EXISTS {left}")
    spark.sql(f"DROP TABLE IF EXISTS {right}")


def test_cobucketed_join_no_exchange(spark, two_bucketed_tables):
    left, right = two_bucketed_tables
    joined = cobucketed_join(spark, left, right, "k", prefer_sortmerge=True)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the whole point: same-bucketed sides join with zero shuffle
    assert "Exchange" not in plan
    assert joined.count() == 5_000
    # values survive the layout
    row = joined.filter(F.col("k") == 4321).first()
    assert row.v == 4321 % 97 and row.w == 4321 % 13


def test_bucketed_aggregation_no_exchange(spark, two_bucketed_tables):
    left, _ = two_bucketed_tables
    agg = spark.table(left).groupBy("k").agg(F.sum("v").alias("sv"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # grouping on the bucket key reuses the bucketing — no shuffle
    assert "Exchange" not in plan
    assert agg.count() == 10_000


def test_compaction_reduces_files_preserves_data(spark, tmp_path):
    path = str(tmp_path / "shards")
    df = spark.range(50_000).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.rand(seed=1).alias("x")
    )
    # simulate a streaming-append mess: 64 tiny files
    df.repartition(64).write.mode("overwrite").parquet(path)
    n_before, bytes_before = measure_files(path)
    assert n_before == 64
    target = max(1, bytes_before // 4)
    plan = compact_parquet(spark, path, target_bytes=target)
    n_after, bytes_after = measure_files(path)
    assert n_after == plan["n_output_files"] < n_before
    # exact same rows
    back = spark.read.parquet(path)
    assert back.count() == 50_000
    assert back.agg(F.sum("id")).first()[0] == sum(range(50_000))


def test_compaction_preserve_sort_keeps_skipping(spark, tmp_path):
    import pyarrow.parquet as pq
    import os

    path = str(tmp_path / "sorted")
    df = spark.range(40_000).select(F.col("id"), (F.col("id") * 2).alias("y"))
    df.repartition(32).write.mode("overwrite").parquet(path)
    compact_parquet(spark, path, target_bytes=64 * 1024, preserve_sort=["id"])
    # footer min/max ranges must be disjoint across files (clustered layout)
    ranges = []
    for root, _d, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                col = md.row_group(0).column(0)
                ranges.append(
                    (col.statistics.min, col.statistics.max)
                )
    assert len(ranges) > 1
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2  # disjoint → min/max stats prune point/range scans


def test_plan_compaction_math(tmp_path, spark):
    path = str(tmp_path / "p")
    spark.range(1000).write.mode("overwrite").parquet(path)
    plan = plan_compaction(path, target_bytes=10**12)
    assert plan["n_output_files"] == 1
    assert plan["n_files"] >= 1 and plan["total_bytes"] > 0


# ---------------------------------------------------------------------------
# schema-evolution append (sources/tabular.py)
# ---------------------------------------------------------------------------


def test_evolve_append_new_column_and_widening(spark, tmp_path):
    from gfw_data_api_spark.sources.tabular import append_with_evolution

    path = str(tmp_path / "tbl")
    spark.createDataFrame([(1, 10), (2, 20)], "id int, v int").write.parquet(path)
    incoming = spark.createDataFrame(
        [(3, 9_999_999_999, "x")], "id int, v bigint, note string"
    )
    out = append_with_evolution(spark, path, incoming)
    # v widened int→bigint, note added (null for old rows)
    assert dict(out.dtypes) == {"id": "int", "v": "bigint", "note": "string"}
    rows = {r.id: (r.v, r.note) for r in out.collect()}
    assert rows == {1: (10, None), 2: (20, None), 3: (9_999_999_999, "x")}
    # directory is schema-homogeneous: a plain re-read sees everything
    again = spark.read.parquet(path)
    assert again.count() == 3 and dict(again.dtypes)["v"] == "bigint"


def test_evolve_append_identical_schema_no_rewrite(spark, tmp_path):
    import os

    from gfw_data_api_spark.sources.tabular import append_with_evolution

    path = str(tmp_path / "tbl2")
    spark.createDataFrame([(1, "a")], "id int, s string").write.parquet(path)
    before = {
        f for f in os.listdir(path) if f.endswith(".parquet")
    }
    append_with_evolution(
        spark, path, spark.createDataFrame([(2, "b")], "id int, s string")
    )
    after = {f for f in os.listdir(path) if f.endswith(".parquet")}
    assert before <= after  # original files untouched — pure append


def test_evolve_append_incompatible_type_rejected(spark, tmp_path):
    import pytest as _pytest

    from gfw_data_api_spark.sources.tabular import append_with_evolution

    path = str(tmp_path / "tbl3")
    spark.createDataFrame([(1, 1.5)], "id int, v double").write.parquet(path)
    bad = spark.createDataFrame([(2, "oops")], "id int, v string")
    with _pytest.raises(ValueError, match="incompatible"):
        append_with_evolution(spark, path, bad)


def test_swap_recovery_restores_parked_dir(spark, tmp_path):
    import os

    from gfw_data_api_spark.sources.compaction import recover_swap

    path = str(tmp_path / "crashed")
    spark.range(10).write.parquet(path)
    # simulate a crash mid-swap: data parked at ._swap_old, path missing
    os.rename(path, path + "._swap_old")
    recover_swap(path)
    assert spark.read.parquet(path).count() == 10
    assert not os.path.exists(path + "._swap_old")


def test_compaction_rejects_remote_path(spark):
    import pytest as _pytest

    from gfw_data_api_spark.sources.compaction import compact_parquet

    with _pytest.raises(ValueError, match="local path"):
        compact_parquet(spark, "s3a://bucket/table")


def test_compaction_recovers_before_reading(spark, tmp_path):
    import os

    from gfw_data_api_spark.sources.compaction import compact_parquet

    path = str(tmp_path / "crashed2")
    spark.range(100).write.parquet(path)
    os.rename(path, path + "._swap_old")  # crashed mid-swap state
    plan = compact_parquet(spark, path, target_bytes=10**9)
    assert spark.read.parquet(path).count() == 100
    assert plan["total_bytes"] > 0  # measured AFTER recovery, not on nothing
