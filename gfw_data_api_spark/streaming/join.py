"""Stream-stream interval joins.

The reference has no stream processing (SURVEY.md §1.4); this is the
Spark-native upgrade path for correlating two live event streams —
e.g. attributing purchases to the views that preceded them. Built on
Structured Streaming's watermarked stream-stream join: BOTH sides carry
a watermark and the join condition bounds event time on both sides, so
each side's state store retains only rows inside the interval window —
without the time bound, stream-stream join state grows unboundedly and
Spark rejects the query in append mode.

The identical plan runs batch (the oracle-checkable path in the driver
gate): Catalyst executes the equi-key part as an ordinary shuffled join
with the interval predicate applied post-match, so there is no
nested-loop blowup as long as ``keys`` is non-empty.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``keys`` where the right event happens
    within ``[left_ts, left_ts + upper]``.

    Column collisions are resolved by prefixing: the output carries
    every left column unprefixed and the right side's timestamp/value
    columns as ``right_<name>`` (keys appear once).

    On streaming inputs both sides get ``withWatermark`` (state bound:
    Spark keeps left rows until ``watermark + upper`` past the left
    watermark, right rows until ``watermark``); on batch inputs the
    same condition is a plain shuffled equi-join + range filter.
    """
    if isinstance(keys, str):
        keys = [keys]
    lhs = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rhs = right.withWatermark(right_ts, watermark) if right.isStreaming else right

    renames = [c for c in rhs.columns if c not in keys]
    rhs = rhs.select(
        *[F.col(k).alias(f"_rk_{k}") for k in keys],
        *[F.col(c).alias(f"right_{c}") for c in renames],
    )
    # the interval bound must live IN the join condition (not a
    # post-filter) — stream-stream state cleanup keys off it
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    cond = (
        cond
        & (F.col(f"right_{right_ts}") >= F.col(left_ts))
        & (F.col(f"right_{right_ts}") <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lhs.join(rhs, on=cond, how=how).drop(*[f"_rk_{k}" for k in keys])
