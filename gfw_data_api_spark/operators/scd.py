"""SCD-2 history builder: change events → validity intervals.

The complement of operators/merge.py's SCD-1 (latest-wins): type-2
slowly-changing dimensions keep EVERY state with its validity window
``[valid_from, valid_to)``, the standard warehouse shape for
"what was this entity's attribute at time T" joins (which then run
through operators/timeseries.py's as-of join). Built from a raw change
stream by collapsing consecutive same-value events per key into one
interval.

Scale shape: two window passes over the same (key, time) partitioning —
Catalyst reuses one Exchange + sort for the change-flag and the
running-group-id; the interval aggregation groups on (key, group) which
is a prefix-compatible key (no second shuffle of the full data beyond
the aggregation itself); the closing ``lead`` re-sorts only the
collapsed intervals (orders of magnitude fewer rows). Partitions by
entity key, so 100 TB of history spreads by key with key-local sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    df: DataFrame,
    keys: list[str] | str,
    value_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse a change-event stream into SCD-2 validity intervals.

    Returns one row per (key, run of consecutive equal ``value_col``):
    ``keys..., value_col, valid_from, valid_to, n_events`` where
    ``valid_to`` is the next interval's start (NULL for the current
    state — the half-open ``[from, to)`` convention).

    ``tiebreak_col`` makes ordering total when ``ts_col`` has duplicates
    (pass the event id); without a total order, run boundaries on tied
    timestamps are nondeterministic.
    """
    if isinstance(keys, str):
        keys = [keys]
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(value_col).over(w)
    # null-safe change test: a run of NULL values is still one run, and
    # only the partition's first row (where eqNullSafe on a NULL prev
    # can't be confused with a NULL value) starts a group "for free"
    changed = F.when(~prev.eqNullSafe(F.col(value_col)), 1).otherwise(0)
    grouped = (
        df.withColumn("_chg", changed)
        .withColumn(
            "_grp",
            F.sum("_chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .groupBy(*keys, F.col("_grp"), F.col(value_col))
        .agg(
            F.min(ts_col).alias("valid_from"),
            F.count("*").alias("n_events"),
        )
    )
    # order runs by the group id, not valid_from: _grp is monotone in the
    # event order, so adjacent runs starting at the SAME timestamp (tied
    # ts, tiebreak-ordered) still close in the right sequence
    w2 = Window.partitionBy(*keys).orderBy("_grp")
    return grouped.select(
        *keys,
        value_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )
