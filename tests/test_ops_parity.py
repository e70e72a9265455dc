"""Operational parity: query watchdog (58s → 524) and pagination (I6)."""

import time

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.operators.pagination import paginate
from gfw_data_api_spark.operators.watchdog import QueryTimeoutError, collect_with_timeout


def test_fast_query_passes_watchdog(spark):
    df = spark.range(1000).agg(F.sum("id").alias("s"))
    rows = collect_with_timeout(spark, df, timeout_s=30.0)
    assert rows[0]["s"] == 499500


def test_slow_query_cancelled(spark):
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType

    @F.udf(LongType())
    def slow(x):
        time.sleep(5)
        return x

    df = spark.range(64).repartition(32).select(slow(F.col("id")).alias("v")).agg(F.sum("v"))
    start = time.time()
    with pytest.raises(QueryTimeoutError):
        collect_with_timeout(spark, df, timeout_s=2.0)
    # the uncancelled job needs two 5s task waves (64 tasks / 32 cores);
    # generous bound to avoid load-sensitivity, still proves cancellation
    assert time.time() - start < 15


def test_pagination_envelope(spark, sf_dir):
    from gfw_data_api_spark.sources.tabular import load_table

    customer = load_table(spark, sf_dir, "customer")
    total = customer.count()
    page = paginate(customer, page=3, size=10, order_by=["c_custkey"], base_url="/datasets")
    assert page.meta == {
        "size": 10,
        "page": 3,
        "total_items": total,
        "total_pages": -(-total // 10),
    }
    assert [r["c_custkey"] for r in page.data] == list(range(20, 30))
    assert page.links["prev"] == "/datasets?page[number]=2&page[size]=10"
    assert page.links["first"] == "/datasets?page[number]=1&page[size]=10"


def test_pagination_bounds(spark, sf_dir):
    from gfw_data_api_spark.sources.tabular import load_table

    customer = load_table(spark, sf_dir, "customer")
    last = paginate(customer, page=1, size=10_000, order_by=["c_custkey"])
    assert last.links["next"] is None
    with pytest.raises(ValueError):
        paginate(customer, page=0)


def test_approx_count_distinct_bounded_error(spark):
    """a01 gate twin: the HLL++ error-envelope boolean the oracle checks
    must actually be computed from the sketch (not constant-folded), and
    the estimate must land inside it."""
    from gfw_data_api_spark import inventory

    rows = inventory.SPECS["a01_approx_count_distinct"].spark_fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["approx_within_10pct"] is True, r
        assert r["exact_parts"] > 0, r


def test_count_min_sketch_guarantees(spark):
    """CMS never undercounts; exact values recoverable when no collision;
    estimates deterministic across rebuilds."""
    from gfw_data_api_spark.operators.sketches import (
        count_min_estimate,
        count_min_table,
    )

    import pyspark.sql.functions as F

    rows = [(v,) for v in [1] * 50 + [2] * 30 + [3] * 7 + list(range(100, 160))]
    df = spark.createDataFrame(rows, "uid long")
    cms = count_min_table(df, "uid", width=256, depth=4)
    probe = spark.createDataFrame([(1,), (2,), (3,), (100,), (9999,)], "uid long")
    est = {
        r.uid: r.cms_est
        for r in count_min_estimate(cms, probe, "uid", width=256, depth=4).collect()
    }
    exact = {1: 50, 2: 30, 3: 7, 100: 1, 9999: 0}
    for uid, true_count in exact.items():
        assert est[uid] >= true_count, (uid, est[uid], true_count)
    # 63 distinct keys in 256 buckets x 4 rows: min-over-rows recovers the
    # exact count for the heavy keys unless a key collides in EVERY row
    n = sum(exact.values())
    for uid, true_count in exact.items():
        assert est[uid] - true_count <= n // 4, (uid, est[uid], true_count)
    # deterministic: rebuilding gives identical estimates
    cms2 = count_min_table(df, "uid", width=256, depth=4)
    est2 = {
        r.uid: r.cms_est
        for r in count_min_estimate(cms2, probe, "uid", width=256, depth=4).collect()
    }
    assert est == est2
