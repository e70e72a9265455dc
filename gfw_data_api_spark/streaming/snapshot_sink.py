"""Exactly-once streaming sink: one snapshot commit per micro-batch.

Structured Streaming's parquet sink is append-only with at-least-once
file semantics on recovery edge cases; the lakehouse answer is an
idempotent commit keyed by the micro-batch id (Delta's txn/appId
pattern). Built here on sources/snapshots.py: each micro-batch commits
a new immutable version whose manifest entry records the batch id —
when a batch is REDELIVERED after a restart (the at-least-once case),
the sink sees the id already in the log and skips, making the whole
pipeline exactly-once end to end without any sink-side dedup scan.

Scale shape: the per-batch cost is the batch write itself plus one
manifest rename; the replay check reads the (tiny) manifest, never the
data. Compaction of many small batch versions = snapshot_commit of the
compacted whole (it's just another commit).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from gfw_data_api_spark.sources.snapshots import (
    snapshot_commit,
    snapshot_history,
)

_BATCH_PREFIX = "stream_batch:"


def committed_batch_ids(table_dir: str) -> set[int]:
    """Micro-batch ids already committed to ``table_dir``."""
    out = set()
    for v in snapshot_history(table_dir):
        note = v.get("note", "")
        if note.startswith(_BATCH_PREFIX):
            out.add(json.loads(note[len(_BATCH_PREFIX):])["batch_id"])
    return out


def snapshot_sink(table_dir: str):
    """``foreachBatch`` function committing each micro-batch exactly once.

    Usage::

        stream.writeStream.foreachBatch(snapshot_sink(dir))
              .option("checkpointLocation", ckpt).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table_dir):
            return  # redelivery after restart — already committed
        snapshot_commit(
            batch_df,
            table_dir,
            note=_BATCH_PREFIX + json.dumps({"batch_id": batch_id}),
        )

    return write_batch


def read_stream_table(spark, table_dir: str) -> DataFrame:
    """Read the accumulated stream table: the UNION of all committed
    micro-batch versions.

    For a stream table the version log is a sequence of DELTA commits
    (one per batch), not full-table states, so the table's content is
    every committed version together — resolved from the manifest once
    (snapshot isolation still holds: a concurrent in-flight batch commit
    is invisible until its manifest rename lands).
    """
    import os

    versions = [
        v["id"]
        for v in snapshot_history(table_dir)
        if v.get("note", "").startswith(_BATCH_PREFIX)
    ]
    if not versions:
        raise FileNotFoundError(f"no committed stream batches in {table_dir}")
    paths = [os.path.join(table_dir, f"v={vid}") for vid in versions]
    return spark.read.parquet(*paths)
