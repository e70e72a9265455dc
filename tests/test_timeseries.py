"""As-of and interval joins (operators/timeseries.py) vs hand-computed and
pandas-merge_asof goldens, plus plan-shape guards (one shuffle, no
nested-loop join)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.operators.timeseries import asof_join, interval_join
from gfw_data_api_spark.sources.tabular import load_table


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            (1, "A", _ts(1), 100.0),
            (2, "A", _ts(5), 101.0),
            (3, "B", _ts(3), 50.0),
            (4, "B", _ts(0), 49.0),  # before any quote
            (5, "C", _ts(9), 7.0),  # key with no quotes at all
        ],
        "trade_id long, sym string, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            ("A", _ts(0), 99.5),
            ("A", _ts(5), 100.5),  # tie with trade 2 → counts (<=)
            ("A", _ts(7), 102.5),  # after trade 2 → ignored backward
            ("B", _ts(2), 48.5),
        ],
        "sym string, ts timestamp, quote double",
    )
    return trades, quotes


def test_asof_backward_golden(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="ts", by=["sym"], values=["quote"])
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    assert got == {1: 99.5, 2: 100.5, 3: 48.5, 4: None, 5: None}
    assert out.count() == trades.count()  # left-join row preservation


def test_asof_forward_golden(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(trades, quotes, on="ts", by=["sym"], values=["quote"], direction="forward")
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    # forward: nearest quote at-or-after the trade
    assert got == {1: 100.5, 2: 100.5, 3: None, 4: 48.5, 5: None}


def test_asof_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="ts", by=["sym"], values=["quote"], tolerance_us=60_000_000
    )
    got = {r["trade_id"]: r["quote"] for r in out.collect()}
    # trade 1 matched a quote 60s away (kept), trade 3's match is 60s (kept),
    # trade 2's tie is 0s; nothing farther survives
    assert got == {1: 99.5, 2: 100.5, 3: 48.5, 4: None, 5: None}


def test_asof_matches_pandas_merge_asof(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    got = (
        asof_join(purchases, views, on="ts", by=["user_id"], values=["view_event_id"])
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    p = purchases.toPandas().sort_values("ts")
    v = views.toPandas().sort_values("ts")
    want = (
        pd.merge_asof(p, v, on="ts", by="user_id", direction="backward")
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert got["view_event_id"].where(got["view_event_id"].notna()).equals(
        want["view_event_id"].where(want["view_event_id"].notna())
    )
    assert len(got) == len(want)


def test_asof_single_shuffle_no_nested_loop(trades_quotes):
    trades, quotes = trades_quotes
    plan = asof_join(trades, quotes, on="ts", by=["sym"], values=["quote"])._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # union-merge: the only exchanges are the window's hash partitioning
    # (plus AQE reads); no join exchange pair
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_interval_join_golden(spark):
    events = spark.createDataFrame(
        [(i, _ts(i), float(i)) for i in range(10)],
        "event_id long, ts timestamp, value double",
    )
    intervals = spark.createDataFrame(
        [
            (100, _ts(1), _ts(3)),  # events 1,2,3 (inclusive)
            (101, _ts(2), _ts(4)),  # overlaps: 2,3,4
            (102, _ts(8), _ts(9)),  # 8,9
            (103, _ts(30), _ts(40)),  # empty
        ],
        "iv_id long, s timestamp, e timestamp",
    )
    out = interval_join(
        events, intervals, ts_col="ts", start_col="s", end_col="e", bucket_s=60
    )
    got = sorted((r["iv_id"], r["event_id"]) for r in out.collect())
    assert got == [
        (100, 1), (100, 2), (100, 3),
        (101, 2), (101, 3), (101, 4),
        (102, 8), (102, 9),
    ]


def test_interval_join_left_and_bucket_width(spark):
    events = spark.createDataFrame(
        [(1, _ts(5), 1.0), (2, _ts(20), 2.0)],
        "event_id long, ts timestamp, value double",
    )
    intervals = spark.createDataFrame(
        [(7, _ts(4), _ts(6))], "iv_id long, s timestamp, e timestamp"
    )
    for bucket_s in (1, 37, 3600):
        out = interval_join(
            events, intervals, ts_col="ts", start_col="s", end_col="e",
            bucket_s=bucket_s, how="left",
        )
        rows = {r["event_id"]: r["iv_id"] for r in out.collect()}
        assert rows == {1: 7, 2: None}, f"bucket_s={bucket_s}"


def test_interval_join_shared_lineage_self_join(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    incidents = events.filter(F.col("event_type") == "error").limit(5).select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("inc_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("inc_end"),
    )
    out = interval_join(
        events.select("event_id", "ts"),
        incidents,
        ts_col="ts",
        start_col="inc_start",
        end_col="inc_end",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert out.count() > 0


def test_interval_join_rejects_column_collision(spark):
    df = spark.createDataFrame([(1, _ts(0))], "event_id long, ts timestamp")
    iv = spark.createDataFrame([(1, _ts(0), _ts(1))], "event_id long, s timestamp, e timestamp")
    with pytest.raises(ValueError, match="collision"):
        interval_join(df, iv, ts_col="ts", start_col="s", end_col="e")
