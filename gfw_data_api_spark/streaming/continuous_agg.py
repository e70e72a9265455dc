"""Continuous aggregate (hypertable-rollup analog): a materialized
time-bucket aggregate refreshed incrementally as events append.

The reference's NRT datasets re-query raw rows on every request; the
TimescaleDB-style upgrade keeps a materialized rollup that a refresh
updates ONLY for the buckets the new batch touches:

1. aggregate the new batch to (bucket, keys) partials — one shuffle over
   the batch, never the history;
2. read back ONLY the affected date partitions of the store (partition
   pruning on the bucket-date directory key);
3. merge partials (count/sum are decomposable — same algebra as the
   salted aggregation's phase 2) and rewrite just those partitions
   (dynamic partition overwrite).

Cost per refresh is O(batch + affected-partition size), independent of
total history — the property that makes a rolling 100 TB event store
queryable at interactive latency.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousAggregate:
    """Materialized (bucket_start, *keys) → (n_events, sum_value) rollup."""

    def __init__(
        self,
        store_path: str,
        bucket: str = "1 hour",
        keys: list[str] | None = None,
        ts_col: str = "ts",
        value_col: str = "value",
    ):
        self.store_path = store_path
        self.bucket = bucket
        self.keys = list(keys or [])
        self.ts_col = ts_col
        self.value_col = value_col

    def _partials(self, events: DataFrame) -> DataFrame:
        win = F.window(F.col(self.ts_col), self.bucket)
        return (
            events.groupBy(win.alias("_w"), *self.keys)
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col(self.value_col).cast("decimal(18,4)")).alias("_sum_dec"),
            )
            .select(
                F.col("_w.start").alias("bucket_start"),
                F.to_date("_w.start").alias("bucket_date"),
                *self.keys,
                "n_events",
                # pin the stored type: sum(decimal(18,4)) widens to (28,4),
                # and a re-sum on merge would widen again — mixed decimal
                # precisions across partition files break the next read
                F.col("_sum_dec").cast("decimal(28,4)").alias("_sum_dec"),
            )
        )

    def refresh(self, spark: SparkSession, new_events: DataFrame) -> list[str]:
        """Merge a new batch into the store; returns affected date keys."""
        partials = self._partials(new_events).persist()
        try:
            # ONE map-side-combined aggregate to a single tiny partition —
            # this action also materializes the persisted partials. The
            # old select().distinct().collect() paid a hash exchange on
            # bucket_date plus a separate AQE stage for the same driver
            # traffic (optimization round 13, guide §2.3 "aggregate before
            # you shuffle"; interleaved A/B on ca01: median 3.68 -> 3.43 s).
            # collect_set state stays bounded at the distinct-date count.
            dates = [
                str(d)
                for d in partials.agg(
                    F.collect_set("bucket_date").alias("_dates")
                ).collect()[0]["_dates"]
            ]
            if not dates:
                return []
            merged = partials
            if os.path.isdir(self.store_path) and any(
                entry.startswith("bucket_date=") for entry in os.listdir(self.store_path)
            ):
                existing = spark.read.parquet(self.store_path).filter(
                    F.col("bucket_date").isin(dates)  # partition-pruned read
                )
                merged = partials.unionByName(existing).groupBy(
                    "bucket_start", "bucket_date", *self.keys
                ).agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("_sum_dec").cast("decimal(28,4)").alias("_sum_dec"),
                )
            with _partition_overwrite(spark):
                merged.write.mode("overwrite").partitionBy("bucket_date").parquet(
                    self.store_path
                )
            return sorted(dates)
        finally:
            partials.unpersist()

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.store_path).select(
            "bucket_start",
            *self.keys,
            "n_events",
            F.col("_sum_dec").cast("double").alias("sum_value"),
        )


class _partition_overwrite:
    """Scoped spark.sql.sources.partitionOverwriteMode=dynamic: overwrite
    replaces ONLY the partitions present in the written frame."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.sources.partitionOverwriteMode", self.prev)
