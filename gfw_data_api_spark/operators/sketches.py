"""Frequency sketches: Misra–Gries heavy hitters over a column.

Why a sketch when Spark's exact ``groupBy(col).count()`` already
scales: the exact path shuffles one row per DISTINCT value. On a
100 TB corpus column with billions of distinct values (URLs, user
ids), that shuffle IS the job. Misra–Gries summarizes each partition
down to ``capacity`` candidate rows first, so the shuffle moves at
most ``partitions × capacity`` rows regardless of cardinality.

Guarantees carried to the merged result (the classic MG bounds,
summed over partitions — Misra & Gries 1982; merge analysis per
Agarwal et al., "Mergeable Summaries", PODS 2012):

- **never overcounts**: ``est(v) ≤ true_count(v)``;
- **bounded undercount**: ``true_count(v) − est(v) ≤ n/(capacity+1)``
  where n is the total row count — for EVERY value, present or evicted;
- **survival**: any value with ``true_count > n/(capacity+1)`` has
  est > 0 and therefore appears in the candidate set.

These deterministic bounds are what the a03 gate pins as boolean
columns beside the exact counts (same pattern as the a01/a02
approximate-aggregate gates).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def misra_gries(values: Iterator, capacity: int) -> dict:
    """Sequential Misra–Gries summary: at most ``capacity`` counters."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < capacity:
            counters[v] = 1
        else:
            # decrement-all; drop zeros (the classic O(1)-amortized step)
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def heavy_hitter_candidates(
    df: DataFrame, value_col: str, capacity: int = 256
) -> DataFrame:
    """(value, est_count) Misra–Gries candidates, merged across partitions.

    Plan shape: mapInPandas builds one MG summary PER ARROW BATCH
    (bounded memory however large the partition), emitting ≤ capacity
    rows per batch; a single hash aggregation sums the per-batch
    estimates. Summed MG bounds still hold (mergeable-summary
    property), with n = total rows. Nothing driver-side; the shuffle
    carries candidate rows only.
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    field = df.schema[value_col]
    out_schema = T.StructType(
        [T.StructField("value", field.dataType), T.StructField("_est", T.LongType())]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            counters = misra_gries(iter(pdf[value_col].dropna()), capacity)
            yield pd.DataFrame(
                {"value": list(counters.keys()), "_est": list(counters.values())}
            ).astype({"_est": "int64"}) if counters else pd.DataFrame(
                {"value": pd.Series([], dtype=object), "_est": pd.Series([], dtype="int64")}
            )

    return (
        df.select(value_col)
        .mapInPandas(summarize, schema=out_schema)
        .groupBy("value")
        .agg(F.sum("_est").alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    capacity: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """Top-k heavy hitters with exact counts verified on the sketch's
    candidate set.

    Two passes over the data, zero full-cardinality shuffles: pass 1
    builds the MG candidate set (≤ batches × capacity rows shuffled);
    pass 2 re-scans with a map-side ``isin``-style semi join against
    the (small, broadcastable-by-AQE) candidate set and counts exactly.
    Any value heavier than n/(capacity+1) is guaranteed present, so for
    a chosen threshold θ ≥ 1/(capacity+1) the exact top-k among
    ≥θ-share values is exact — the standard two-pass heavy-hitter
    recipe, expressed as two Catalyst aggregations.
    """
    cand = heavy_hitter_candidates(df, value_col, capacity)
    exact = (
        df.select(F.col(value_col).alias("value"))
        .join(cand, "value", "left_semi")
        .groupBy("value")
        .agg(F.count("*").alias("exact_count"))
    )
    return (
        exact.join(cand, "value")
        .orderBy(F.desc("exact_count"), F.asc("value"))
        .limit(top_k)
    )


def count_min_table(
    df: DataFrame, value_col: str, width: int = 512, depth: int = 4
) -> DataFrame:
    """Count–Min sketch (Cormode & Muthukrishnan 2005) as a long-form
    counter table ``(r, b, cnt)`` — the d×w matrix with only touched
    cells stored.

    Why a sketch when exact ``groupBy.count`` scales: the exact path
    shuffles one row per DISTINCT value; the CMS build shuffles into at
    most ``depth × width`` cells regardless of cardinality (map-side
    combine collapses each partition to ≤ d·w rows first) — same
    motivation as Misra–Gries above, but supporting point-frequency
    queries over values chosen AFTER the pass, not just heavy hitters.

    Hash family: ``xxhash64(value, seed=r) % width`` — deterministic
    per (value, row), so estimates are reproducible run-to-run.
    """
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64(F.col(value_col), F.lit(r)), F.lit(width)).alias("b"),
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(probes).alias("c"))
        .select("c.r", "c.b")
        .groupBy("r", "b")
        .agg(F.count("*").alias("cnt"))
    )


def count_min_estimate(
    cms: DataFrame,
    values_df: DataFrame,
    value_col: str,
    width: int = 512,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``values_df[value_col]`` against a
    :func:`count_min_table` built with the SAME (width, depth).

    ``est = min_r cms[r][h_r(v)]`` — the classic CMS estimate, which
    deterministically NEVER undercounts (every occurrence of v lands in
    each probed cell; collisions only add). Absent cells read 0. One
    broadcast-sized join: the probe side is |values|×depth rows, the
    sketch side ≤ depth×width cells.
    """
    probes = F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                F.pmod(F.xxhash64(F.col(value_col), F.lit(r)), F.lit(width)).alias("b"),
            )
            for r in range(depth)
        ]
    )
    probe_rows = values_df.select(value_col, F.explode(probes).alias("c")).select(
        value_col, "c.r", "c.b"
    )
    joined = probe_rows.join(cms, ["r", "b"], "left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    return joined.groupBy(value_col).agg(F.min("cnt").alias("cms_est"))
