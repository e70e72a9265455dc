"""Streaming windowed / session aggregations over event streams.

The reference has no stream processing (SURVEY.md §1.4/§2.7) — NRT alert
datasets are batch appends. These operators are the Spark-native upgrade
path for the same event data (the driver's ``events`` table models the
stream): event-time tumbling windows with watermarks for late data, and
session windows with an inactivity gap — both built on Structured
Streaming primitives so the identical code runs batch (as here, for the
oracle-checkable path) or with ``readStream`` on a live source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time tumbling-window aggregation.

    On a streaming DataFrame the watermark bounds state and admits late
    events up to the threshold; on a batch DataFrame (as in the driver
    tables) withWatermark is a no-op and results are the closed-form
    windowed aggregation — the same code path serves both.
    """
    stream = events
    if events.isStreaming:
        stream = events.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window_duration).alias("window")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream.groupBy(*keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "sum_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide_duration: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Event-time sliding (hopping) windows: each event lands in
    duration/slide overlapping windows. Spark materializes the overlap
    inside the window operator (no user-side explode); state per window
    is bounded by the watermark on a stream."""
    stream = events
    if events.isStreaming:
        stream = events.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window_duration, slide_duration).alias("window")] + [
        F.col(c) for c in (group_cols or [])
    ]
    return (
        stream.groupBy(*keys)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *(group_cols or []),
            "n_events",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Session windows: activity runs per user separated by ``gap`` of
    inactivity (F.session_window — dynamic-length windows, the built-in
    replacement for a custom applyInPandasWithState sessionizer)."""
    stream = events
    if events.isStreaming:
        stream = events.withWatermark(ts_col, gap)
    return (
        stream.groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_col,
            "n_events",
            "sum_value",
        )
    )
