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


# --------------------------------------------------------------------------
# skew + stateful operators
# --------------------------------------------------------------------------


def test_salted_groupby_matches_plain(spark, sf_dir):
    from gfw_data_api_spark.operators.skew import salted_groupby

    li = load_table(spark, sf_dir, "lineitem")
    salted = salted_groupby(
        li,
        keys=["l_returnflag"],
        aggs={
            "cnt": ("count", None),
            "sum_qty": ("sum_decimal", "l_quantity"),
            "min_disc": ("min", "l_discount"),
            "max_price": ("max", "l_extendedprice"),
        },
        salt_buckets=8,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.min("l_discount").alias("min_disc"),
        F.max("l_extendedprice").alias("max_price"),
    )
    got = {r["l_returnflag"]: r.asDict() for r in salted.collect()}
    want = {r["l_returnflag"]: r.asDict() for r in plain.collect()}
    assert got == want


def test_salted_groupby_rejects_nondecomposable(spark):
    from gfw_data_api_spark.operators.skew import salted_groupby

    df = spark.createDataFrame([(1, 2)], "a int, b int")
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_groupby(df, ["a"], {"x": ("avg", "b")})


def test_first_occurrence_batch(spark):
    from gfw_data_api_spark.streaming.stateful import first_occurrence

    rows = [
        (1, 10, dt.datetime(2024, 1, 1, 0, 5)),
        (2, 11, dt.datetime(2024, 1, 1, 0, 1)),  # earliest for user 1
        (3, 11, dt.datetime(2024, 1, 1, 0, 2)),
        (4, 12, dt.datetime(2024, 1, 1, 0, 3)),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = first_occurrence(df, key_col="user_id")
    got = {r["user_id"]: r["event_id"] for r in out.collect()}
    assert got == {10: 1, 11: 2, 12: 4}


def test_first_occurrence_stream_matches_batch(spark, sf_dir, tmp_path):
    from gfw_data_api_spark.streaming.stateful import first_occurrence

    events = load_table(spark, sf_dir, "events").limit(500)
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    static = spark.read.parquet(src)

    batch = {
        (r["user_id"], r["event_id"])
        for r in first_occurrence(static, key_col="user_id").collect()
    }

    stream = spark.readStream.schema(static.schema).parquet(src)
    out = first_occurrence(stream, key_col="user_id")
    sink = str(tmp_path / "sink")
    q = (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {
        (r["user_id"], r["event_id"]) for r in spark.read.parquet(sink).collect()
    }
    assert streamed == batch


def test_first_occurrence_stream_state_across_batches(spark, tmp_path):
    """Second micro-batch must NOT re-emit keys seen in the first."""
    import pyspark.sql.functions as SF
    from gfw_data_api_spark.streaming.stateful import first_occurrence

    src = str(tmp_path / "src")
    df1 = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1, 0, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    df2 = spark.createDataFrame(
        [(2, 10, dt.datetime(2024, 1, 1, 1, 0)), (3, 20, dt.datetime(2024, 1, 1, 1, 0))],
        "event_id long, user_id long, ts timestamp",
    )
    df1.coalesce(1).write.mode("overwrite").parquet(src)
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(df1.schema).parquet(src)
        q = (
            first_occurrence(stream, key_col="user_id")
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    df2.coalesce(1).write.mode("append").parquet(src)
    run_once()
    rows = {(r["user_id"], r["event_id"]) for r in spark.read.parquet(sink).collect()}
    # user 10's second event suppressed by checkpointed state; user 20 new
    assert rows == {(10, 1), (20, 3)}


def test_continuous_aggregate_incremental_equals_direct(spark, sf_dir, tmp_path):
    from gfw_data_api_spark.streaming.continuous_agg import ContinuousAggregate

    events = load_table(spark, sf_dir, "events")
    ca = ContinuousAggregate(str(tmp_path / "rollup"), "1 hour", keys=["event_type"])
    # refresh in three incremental slices (simulating appends)
    for lo, hi in ((0, 2000), (2000, 4000), (4000, 10**9)):
        batch = events.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        ca.refresh(spark, batch)
    got = {
        (str(r["bucket_start"]), r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in ca.read(spark).collect()
    }
    direct = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("s"),
        )
        .collect()
    )
    want = {
        (str(r["w"]["start"]), r["event_type"]): (r["n"], round(r["s"], 4)) for r in direct
    }
    assert got == want


def test_continuous_aggregate_touches_only_affected_partitions(spark, tmp_path):
    import os

    from gfw_data_api_spark.streaming.continuous_agg import ContinuousAggregate

    def ev(rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string, value double"
        )

    ca = ContinuousAggregate(str(tmp_path / "r"), "1 hour", keys=["event_type"])
    day1 = [(i, dt.datetime(2024, 1, 1, i % 24), "a", 1.0) for i in range(10)]
    day2 = [(100 + i, dt.datetime(2024, 1, 2, i % 24), "a", 2.0) for i in range(10)]
    assert ca.refresh(spark, ev(day1)) == ["2024-01-01"]
    assert ca.refresh(spark, ev(day2)) == ["2024-01-02"]
    # both partitions exist; re-refreshing day2 must not rewrite day1
    p1 = os.path.join(str(tmp_path / "r"), "bucket_date=2024-01-01")
    mtime_before = max(os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1))
    assert ca.refresh(spark, ev([(200, dt.datetime(2024, 1, 2, 5), "a", 3.0)])) == ["2024-01-02"]
    mtime_after = max(os.path.getmtime(os.path.join(p1, f)) for f in os.listdir(p1))
    assert mtime_after == mtime_before
    # merged counts: day2 hour 5 has original rows + the late one
    rows = {
        (str(r["bucket_start"]), r["n_events"])
        for r in ca.read(spark).filter(F.col("bucket_start") == "2024-01-02 05:00:00").collect()
    }
    assert rows == {("2024-01-02 05:00:00", 2)}


# ---------------------------------------------------------------------------
# gap-fill resample + LOCF
# ---------------------------------------------------------------------------


def test_resample_interpolate_linear_fill(spark):
    from gfw_data_api_spark.operators.timeseries import resample_interpolate

    rows = [
        # key "a": obs at hours 0 (val 10) and 3 (val 16) → gaps at 1, 2
        # interpolate: 10 + 6*(1/3) = 12, 10 + 6*(2/3) = 14
        ("a", "2024-01-01 00:30:00", 1, 10.0),
        ("a", "2024-01-01 03:20:00", 2, 16.0),
        # key "b": consecutive obs → nothing to fill
        ("b", "2024-01-01 05:00:00", 3, 5.0),
        ("b", "2024-01-01 06:00:00", 4, 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, id long, value double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "id", "value"
    )
    out = resample_interpolate(df, ["k"], ts_col="ts", value_col="value", order_col="id")
    got = {
        (r["k"], str(r["bucket"])): (r["value"], r["filled"]) for r in out.collect()
    }
    assert got == {
        ("a", "2024-01-01 00:00:00"): (10.0, False),
        ("a", "2024-01-01 01:00:00"): (12.0, True),
        ("a", "2024-01-01 02:00:00"): (14.0, True),
        ("a", "2024-01-01 03:00:00"): (16.0, False),
        ("b", "2024-01-01 05:00:00"): (5.0, False),
        ("b", "2024-01-01 06:00:00"): (7.0, False),
    }


def test_resample_interpolate_multiple_segments_and_tie(spark):
    from gfw_data_api_spark.operators.timeseries import resample_interpolate

    rows = [
        ("a", "2024-01-01 00:00:00", 1, 0.0),
        ("a", "2024-01-01 00:30:00", 2, 2.0),  # same bucket: id 2 wins
        ("a", "2024-01-01 02:00:00", 3, 6.0),  # gap at 1 → 4.0
        ("a", "2024-01-01 04:00:00", 4, 0.0),  # gap at 3 → 3.0
    ]
    df = spark.createDataFrame(rows, "k string, ts string, id long, value double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "id", "value"
    )
    out = resample_interpolate(df, ["k"], order_col="id")
    got = {str(r["bucket"]): r["value"] for r in out.collect()}
    assert got == {
        "2024-01-01 00:00:00": 2.0,
        "2024-01-01 01:00:00": 4.0,
        "2024-01-01 02:00:00": 6.0,
        "2024-01-01 03:00:00": 3.0,
        "2024-01-01 04:00:00": 0.0,
    }


def test_resample_interpolate_single_window_exchange(spark):
    from gfw_data_api_spark.operators.timeseries import resample_interpolate

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", 1, 1.0)], "k string, ts string, id long, value double"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "id", "value")
    plan = (
        resample_interpolate(df, ["k"], order_col="id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all four neighbor columns + row_number must share ONE Window sort
    assert plan.count("Window") <= 2  # row_number window + frame windows
    assert "CartesianProduct" not in plan


def test_resample_locf_fills_gaps(spark):
    from gfw_data_api_spark.operators.timeseries import resample_locf

    rows = [
        # key "a": observations in hours 0, 3 (gap 1-2); in-bucket tie at
        # hour 0 resolved by order col (id 2 wins)
        ("a", "2024-01-01 00:10:00", 1, 10.0),
        ("a", "2024-01-01 00:50:00", 2, 11.0),
        ("a", "2024-01-01 03:20:00", 3, 12.0),
        # key "b": single observation → single-row grid
        ("b", "2024-01-01 05:00:00", 4, 99.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts string, id long, value double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "id", "value"
    )
    out = resample_locf(df, ["k"], ts_col="ts", value_col="value", order_col="id")
    got = {
        (r["k"], str(r["bucket"])): (r["value"], r["filled"]) for r in out.collect()
    }
    assert got == {
        ("a", "2024-01-01 00:00:00"): (11.0, False),  # max-order obs wins the bucket
        ("a", "2024-01-01 01:00:00"): (11.0, True),   # carried forward
        ("a", "2024-01-01 02:00:00"): (11.0, True),
        ("a", "2024-01-01 03:00:00"): (12.0, False),
        ("b", "2024-01-01 05:00:00"): (99.0, False),
    }


def test_interarrival_stats_golden_and_one_shuffle(spark):
    import datetime

    from gfw_data_api_spark.operators.timeseries import interarrival_stats

    t0 = datetime.datetime(2024, 1, 1, 12)

    def at(sec):
        return t0 + datetime.timedelta(seconds=sec)

    rows = [
        (1, at(0), 1), (1, at(10), 2), (1, at(40), 3),   # gaps 10, 30
        (2, at(0), 4),                                    # singleton → null gaps
        (3, at(5), 5), (3, at(5), 6),                     # tie → gap 0 via tiebreak
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = {r.user_id: r for r in interarrival_stats(df, "user_id", tiebreak_col="event_id").collect()}
    assert out[1].n_events == 3
    assert out[1].min_gap_s == 10.0 and out[1].max_gap_s == 30.0
    assert out[1].mean_gap_s == 20.0
    assert out[2].n_events == 1 and out[2].mean_gap_s is None
    assert out[3].min_gap_s == 0.0
    # window + agg share the partitioning key → exactly one exchange
    plan = interarrival_stats(df, "user_id")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
