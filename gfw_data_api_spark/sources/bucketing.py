"""Bucketed table layout: shuffle-free co-located joins and aggregations.

docs/SCALE.md argues repeatedly that at 100 TB the fix for a repeated
big-big join (fact⋈fact, merge upserts, as-of joins) is to bucket both
sides on the join key. This module makes that concrete: write tables
with Spark's ``bucketBy`` (hash-partitioned files + bucket metadata in
the catalog), and the planner then joins two same-bucketed tables with
ZERO Exchange — each task reads bucket i of both sides. The reference's
analog is Postgres hash partitioning (creation_options partition_type
"hash", sources/tabular.py Partitions), which co-locates rows for
constraint checks but cannot co-locate a *join*; bucketing is the
Spark-native upgrade.

Trade-offs encoded here:
- bucket count is fixed at write time — size it for the TARGET scale
  (total_bytes / bucket_count ≈ a task-sized unit, 128-512 MB), not the
  current one; re-bucketing is a full rewrite.
- bucketed writes require the session catalog (``saveAsTable``): bucket
  metadata lives in the metastore, not in parquet footers.
- ``sortBy`` within buckets additionally removes the sort from
  sort-merge joins and enables range-pruning within each file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str] | str,
    num_buckets: int,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) catalog table."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    writer = df.write.format("parquet").mode(mode).bucketBy(
        num_buckets, *bucket_cols
    )
    if sort_cols:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata flows into the planner)."""
    return spark.table(table)


def cobucketed_join(
    spark: SparkSession,
    left: str,
    right: str,
    keys: list[str] | str,
    how: str = "inner",
    prefer_sortmerge: bool = False,
) -> DataFrame:
    """Join two tables bucketed on ``keys`` with the same bucket count.

    When both sides are bucketed on the join keys with equal bucket
    counts, the sort-merge plan has no Exchange on either side (asserted
    in tests): bucket i joins bucket i, the 100 TB join cost collapses
    to a per-bucket merge. ``prefer_sortmerge`` pins that strategy —
    without it the planner may still broadcast a small side (which is
    also shuffle-free, but ignores the bucketing; right at small scale,
    wrong at the scale the buckets were sized for). Misaligned bucket
    counts degrade gracefully to a normal shuffle join — correctness
    never depends on layout.
    """
    if isinstance(keys, str):
        keys = [keys]
    lhs, rhs = spark.table(left), spark.table(right)
    if prefer_sortmerge:
        lhs, rhs = lhs.hint("merge"), rhs.hint("merge")
    return lhs.join(rhs, on=keys, how=how)
