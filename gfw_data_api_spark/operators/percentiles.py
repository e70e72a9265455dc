"""Grouped percentiles: approximate by default, exact opt-in.

The reference exposes PG ``percentile_cont`` pass-through
(query surface Q5/Q11); exact interpolated percentiles buffer every
group's values in one aggregation state — at 100 TB a 3-group
percentile over 600 M rows per group is GBs of reducer state. Spark's
``approx_percentile`` (Greenwald-Khanna sketch, bounded state of
O(accuracy · log n) per group, mergeable map-side) is the scale path,
so it is the DEFAULT here; ``exact=True`` opts into the
value-buffering ``percentile`` for small/verification workloads.

accuracy=10000 bounds rank error at 1/accuracy = 0.01 % of the group
size — far tighter than sampling noise at any SF — with ~80 KB of
state per (group × column), independent of row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_ACCURACY = 10_000


def grouped_percentiles(
    df: DataFrame,
    keys: list[str],
    quantiles: dict[str, tuple[str, float]],
    exact: bool = False,
    accuracy: int = DEFAULT_ACCURACY,
) -> DataFrame:
    """``quantiles`` maps output name → (value column, fraction in [0,1]).

    Default: ``approx_percentile`` sketches (bounded memory, mergeable,
    the 100 TB path). ``exact=True``: interpolated ``percentile`` —
    buffers every value of every group in reducer memory; use only when
    group sizes are known-bounded or for verification.
    """
    aggs = []
    for out, (col, p) in quantiles.items():
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"fraction for {out!r} must be in [0, 1], got {p}")
        if exact:
            aggs.append(F.expr(f"percentile({col}, {p!r})").alias(out))
        else:
            aggs.append(
                F.expr(f"approx_percentile({col}, {p!r}, {accuracy})").alias(out)
            )
    return df.groupBy(*keys).agg(*aggs)
