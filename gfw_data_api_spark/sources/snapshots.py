"""Snapshot-isolated tables: atomic commits, time travel, rollback.

The directory-swap helpers (compaction.py) have an unavoidable
non-atomic window because they mutate the directory a reader is
listing. This module removes the window the same way Delta/Iceberg do:
DATA FILES ARE IMMUTABLE — every write lands in a fresh ``v=N``
subdirectory, and the only mutation is an atomic single-file rename of
the manifest pointer. Readers resolve the manifest once and then read
an immutable snapshot; a writer crash leaves at worst an orphaned
(unreferenced) version directory, never a broken table.

What this buys at 100 TB:
- readers never see a partial write (snapshot isolation),
- ``version=`` time travel and O(1) rollback (re-point the manifest),
- concurrent reader/writer safety on any filesystem with atomic
  single-file rename (POSIX; object stores want a conditional-put,
  same shape).

Kept deliberately minimal: linear version history, one manifest, no
partition-level manifests — the reference's catalog (dataset/version
registry) stays the authority for logical versions, this is the
physical-commit primitive underneath one asset.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "_snapshot_manifest.json"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


def _read_manifest(table_dir: str) -> dict:
    path = _manifest_path(table_dir)
    if not os.path.exists(path):
        return {"current": None, "versions": []}
    with open(path) as fh:
        return json.load(fh)


def _write_manifest_atomic(table_dir: str, manifest: dict) -> None:
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, _manifest_path(table_dir))  # POSIX-atomic pointer flip


def snapshot_commit(df: DataFrame, table_dir: str, note: str = "") -> int:
    """Write ``df`` as the table's next immutable version; returns its id.

    The data write happens entirely inside the new ``v=N`` directory;
    the commit is the final manifest rename. A crash before the rename
    leaves the table untouched (the orphan dir is invisible to readers
    and reclaimable by :func:`vacuum`).
    """
    os.makedirs(table_dir, exist_ok=True)
    manifest = _read_manifest(table_dir)
    committed_max = manifest["versions"][-1]["id"] if manifest["versions"] else -1
    # skip past orphaned v= dirs from crashed writers: a retry must not
    # collide with its own predecessor's half-written data
    on_disk = [
        int(e.split("=", 1)[1])
        for e in os.listdir(table_dir)
        if e.startswith("v=") and e.split("=", 1)[1].isdigit()
    ]
    next_id = max([committed_max, *on_disk], default=-1) + 1
    vdir = os.path.join(table_dir, f"v={next_id}")
    df.write.mode("errorifexists").parquet(vdir)
    manifest["versions"].append(
        {"id": next_id, "note": note, "committed_at": time.time()}
    )
    manifest["current"] = next_id
    _write_manifest_atomic(table_dir, manifest)
    return next_id


def snapshot_read(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the current snapshot, or time-travel to ``version``."""
    manifest = _read_manifest(table_dir)
    if manifest["current"] is None:
        raise FileNotFoundError(f"no committed snapshot in {table_dir}")
    ids = {v["id"] for v in manifest["versions"]}
    target = manifest["current"] if version is None else version
    if target not in ids:
        raise ValueError(f"unknown snapshot version {target}; have {sorted(ids)}")
    return spark.read.parquet(os.path.join(table_dir, f"v={target}"))


def snapshot_history(table_dir: str) -> list[dict]:
    """Commit log, oldest first (id, note, committed_at)."""
    return list(_read_manifest(table_dir)["versions"])


def snapshot_rollback(table_dir: str, version: int) -> None:
    """Re-point ``current`` at an older version (O(1); no data moves).

    The rolled-back-over versions stay in the log (and on disk) so the
    rollback itself is revertible; ``vacuum`` reclaims unreferenced
    data only beyond the retained tail.
    """
    manifest = _read_manifest(table_dir)
    if version not in {v["id"] for v in manifest["versions"]}:
        raise ValueError(f"unknown snapshot version {version}")
    manifest["current"] = version
    _write_manifest_atomic(table_dir, manifest)


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Delete version directories older than the newest ``keep_last``,
    never including ``current``; returns the removed ids. Also reclaims
    orphaned (crashed, never-committed) ``v=`` directories."""
    import shutil

    manifest = _read_manifest(table_dir)
    committed = [v["id"] for v in manifest["versions"]]
    keep = set(committed[-keep_last:]) | {manifest["current"]}
    removed = []
    for entry in os.listdir(table_dir):
        if not entry.startswith("v="):
            continue
        vid = int(entry.split("=", 1)[1])
        if vid in keep:
            continue
        shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
        removed.append(vid)
    manifest["versions"] = [
        v for v in manifest["versions"] if v["id"] in keep or v["id"] not in removed
    ]
    _write_manifest_atomic(table_dir, manifest)
    return sorted(removed)
