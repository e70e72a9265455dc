"""Streaming event deduplication with bounded state.

At-least-once sources (Kinesis/Kafka redeliveries, the reference's NRT
alert feeds re-posting batches) need exactly-once-per-key semantics
downstream. Spark's two primitives, wrapped so the same call works on a
stream or its batch twin:

- ``dropDuplicatesWithinWatermark`` (streaming): keeps a key's state
  only until the watermark passes it — the 100 TB-safe shape, state is
  O(keys inside the watermark window) instead of O(all keys ever).
- plain ``dropDuplicates`` (batch): the deterministic oracle twin — on
  a batch frame duplicates are global, so the result is the classic
  "first occurrence per key" relation (order resolved by the tiebreak
  column for cross-engine determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def dedup_events(
    events: DataFrame,
    keys: list[str] | str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep one event per key.

    Streaming input: ``withWatermark(ts) + dropDuplicatesWithinWatermark``
    — a redelivered key inside the watermark window is dropped; state
    for keys older than the watermark is evicted (late duplicates past
    the watermark are the documented at-least-once residue every
    bounded-state dedup accepts).

    Batch input: deterministic first-occurrence per key — earliest
    ``ts_col``, ties broken by ``tiebreak_col`` (required for exact
    cross-engine reproducibility; defaults to the first key column).
    """
    if isinstance(keys, str):
        keys = [keys]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    tiebreak = tiebreak_col or keys[0]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), F.col(tiebreak).asc())
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
