"""Exactly-once streaming sink: one snapshot commit per micro-batch.

Structured Streaming's parquet sink is append-only with at-least-once
file semantics on recovery edge cases; the lakehouse answer is an
idempotent commit keyed by (application id, micro-batch id) — Delta's
txn appId/version pattern. Built on sources/snapshots.py: each
micro-batch commits a new immutable DELTA version whose manifest entry
records (app_id, batch_id); when a batch is REDELIVERED after a restart
(the at-least-once case), the sink sees the pair already in the log and
skips, making the pipeline exactly-once end to end without a sink-side
dedup scan. The app_id matters: batch ids restart from 0 whenever the
checkpoint is reset, and two different queries writing one table use
overlapping batch-id sequences — id alone would silently drop their
data.

Scale shape: per-batch cost is the batch write plus one manifest
rename; the replay check reads the (tiny) manifest, never the data.
Many small batch versions are folded by :func:`compact_stream_table` —
one compact commit that records which deltas it covers, after which
``vacuum`` can reclaim them while redelivery dedup keeps working (the
covered batch ids travel inside the compact entry).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from gfw_data_api_spark.sources.snapshots import (
    STREAM_BATCH_PREFIX,
    STREAM_COMPACT_PREFIX,
    _covered_versions,
    snapshot_commit,
)


def _ids_from_manifest(manifest: dict, app_id: str) -> set[int]:
    out: set[int] = set()
    for v in manifest["versions"]:
        note = v.get("note", "")
        if note.startswith(STREAM_BATCH_PREFIX):
            meta = json.loads(note[len(STREAM_BATCH_PREFIX):])
            if meta.get("app_id", "default") == app_id:
                out.add(meta["batch_id"])
        elif note.startswith(STREAM_COMPACT_PREFIX):
            meta = json.loads(note[len(STREAM_COMPACT_PREFIX):])
            out.update(meta.get("batch_ids", {}).get(app_id, []))
    return out


def committed_batch_ids(table_dir: str, app_id: str = "default") -> set[int]:
    """Micro-batch ids already committed for ``app_id`` — including ids
    recorded inside compact entries whose delta dirs were vacuumed."""
    from gfw_data_api_spark.sources.snapshots import _read_manifest

    return _ids_from_manifest(_read_manifest(table_dir), app_id)


def snapshot_sink(table_dir: str, app_id: str = "default"):
    """``foreachBatch`` function committing each micro-batch exactly once.

    ``app_id`` identifies the writing QUERY (pass a new one when
    resetting the checkpoint to deliberately reprocess). Usage::

        stream.writeStream.foreachBatch(snapshot_sink(dir, app_id="q1"))
              .option("checkpointLocation", ckpt).start()
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table_dir, app_id):
            return  # fast path: known redelivery, skip even the write
        # the authoritative check runs UNDER the manifest lock (the
        # fast path above can always be invalidated between check and
        # commit — e.g. a zombie driver racing its replacement); losing
        # the race abandons the commit, leaving only a vacuumable orphan
        snapshot_commit(
            batch_df,
            table_dir,
            note=STREAM_BATCH_PREFIX
            + json.dumps({"app_id": app_id, "batch_id": batch_id}),
            precondition=lambda m: batch_id not in _ids_from_manifest(m, app_id),
        )

    return write_batch


def _live_from_manifest(manifest: dict) -> list[dict]:
    """Stream versions (batch or compact) not superseded by a compact."""
    covered = _covered_versions(manifest)
    return [
        v
        for v in manifest["versions"]
        if v["id"] not in covered
        and (
            v.get("note", "").startswith(STREAM_BATCH_PREFIX)
            or v.get("note", "").startswith(STREAM_COMPACT_PREFIX)
        )
    ]


def _live_stream_versions(table_dir: str) -> list[dict]:
    from gfw_data_api_spark.sources.snapshots import _read_manifest

    return _live_from_manifest(_read_manifest(table_dir))


def _read_versions(spark: SparkSession, table_dir: str, live: list[dict]) -> DataFrame:
    import os

    paths = [os.path.join(table_dir, f"v={v['id']}") for v in live]
    return spark.read.parquet(*paths)


def read_stream_table(spark: SparkSession, table_dir: str) -> DataFrame:
    """Read the accumulated stream table: the union of live deltas.

    For a stream table the version log is a sequence of DELTA commits,
    so the content is every uncovered batch version plus any compact
    versions — resolved from the manifest once (snapshot isolation
    holds: an in-flight commit is invisible until its manifest rename).
    """
    live = _live_stream_versions(table_dir)
    if not live:
        raise FileNotFoundError(f"no committed stream batches in {table_dir}")
    return _read_versions(spark, table_dir, live)


def compact_stream_table(spark: SparkSession, table_dir: str) -> int | None:
    """Fold all live deltas into one compact commit; returns its version
    (or None if a concurrent commit invalidated the fold — retry then).

    The live set is resolved ONCE and the compact reads exactly those
    version directories, so a sink batch landing mid-fold can never be
    absorbed into the data while missing from ``covers``. The commit
    precondition (checked under the manifest lock) aborts if the live
    set changed — which also serializes two racing compactions: at most
    one wins, the loser's output becomes a vacuumable orphan.

    The compact entry records the covered version ids (so ``vacuum``
    can reclaim their directories) AND the batch ids they carried per
    app (so redelivery dedup survives the reclamation).
    """
    live = _live_stream_versions(table_dir)
    if not live:
        raise FileNotFoundError(f"no committed stream batches in {table_dir}")
    if len(live) == 1 and live[0].get("note", "").startswith(STREAM_COMPACT_PREFIX):
        return live[0]["id"]  # already fully compacted — nothing to fold
    batch_ids: dict[str, list[int]] = {}
    for v in live:
        note = v.get("note", "")
        if note.startswith(STREAM_BATCH_PREFIX):
            meta = json.loads(note[len(STREAM_BATCH_PREFIX):])
            batch_ids.setdefault(meta.get("app_id", "default"), []).append(
                meta["batch_id"]
            )
        elif note.startswith(STREAM_COMPACT_PREFIX):
            meta = json.loads(note[len(STREAM_COMPACT_PREFIX):])
            for app, ids in meta.get("batch_ids", {}).items():
                batch_ids.setdefault(app, []).extend(ids)
    live_ids = [v["id"] for v in live]
    data = _read_versions(spark, table_dir, live)  # exactly the captured set
    return snapshot_commit(
        data,
        table_dir,
        note=STREAM_COMPACT_PREFIX
        + json.dumps(
            {
                "covers": live_ids,
                "batch_ids": {app: sorted(ids) for app, ids in batch_ids.items()},
            }
        ),
        # SUBSET, not equality: a new batch landing mid-fold does NOT
        # invalidate the fold (it was not read and stays uncovered), and
        # exact equality would livelock compaction under an active
        # stream. What must still hold is that every captured version is
        # present and uncovered — a racing compact covers them, so the
        # second compact's check fails and it abandons (serialization).
        precondition=lambda m: set(live_ids)
        <= {v["id"] for v in _live_from_manifest(m)},
    )
