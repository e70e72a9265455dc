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
    ``ts_col``, ties broken by ``tiebreak_col`` when given, else by
    every remaining column in order (a key column would be constant
    within its own window partition — a no-op tiebreak). Rows that tie
    on EVERY column are identical, so whichever survives is the same
    row.
    """
    if isinstance(keys, str):
        keys = [keys]
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    if tiebreak_col is not None:
        tiebreaks = [F.col(tiebreak_col).asc()]
    else:
        tiebreaks = [
            F.col(c).asc()
            for c in events.columns
            if c not in keys and c != ts_col
        ]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc(), *tiebreaks)
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
