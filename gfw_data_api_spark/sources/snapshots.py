"""Snapshot-isolated tables: atomic commits, time travel, rollback.

The directory-swap helpers (compaction.py) have an unavoidable
non-atomic window because they mutate the directory a reader is
listing. This module removes the window the same way Delta/Iceberg do:
DATA FILES ARE IMMUTABLE — every write lands in a fresh ``v=N``
subdirectory, and the only mutation is an atomic single-file rename of
the manifest pointer. Readers resolve the manifest once and then read
an immutable snapshot; a writer crash leaves at worst an orphaned
(unreferenced) version directory, never a broken table.

Concurrency model (single host): version ids are reserved with an
atomic ``mkdir`` (two writers can never claim the same id), and every
manifest read-modify-write runs under an ``flock`` on a sibling lock
file — a slow writer can no longer clobber a faster writer's committed
entry with its stale manifest copy. Data writes happen OUTSIDE the
lock; only the tiny manifest update serializes. Multi-host object
stores need a conditional-put in place of the rename — same shape,
different primitive.

What this buys at 100 TB:
- readers never see a partial write (snapshot isolation),
- ``version=`` time travel and O(1) rollback (re-point the manifest),
- concurrent reader/writer safety on any filesystem with atomic
  single-file rename + flock.

Version kinds: plain commits are FULL-TABLE states (each version is
the whole table). Stream sinks (streaming/snapshot_sink.py) commit
DELTA versions (note-tagged); :func:`vacuum` understands the
difference and never deletes an uncovered delta.
"""

from __future__ import annotations

import fcntl
import json
import os
import time
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

from gfw_data_api_spark.sources.compaction import _require_local_path

_MANIFEST = "_snapshot_manifest.json"
_LOCK = "_snapshot_lock"

#: note prefixes marking DELTA versions (streaming/snapshot_sink.py)
STREAM_BATCH_PREFIX = "stream_batch:"
STREAM_COMPACT_PREFIX = "stream_compact:"


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, _MANIFEST)


@contextmanager
def _locked(table_dir: str):
    """Advisory exclusive lock serializing manifest mutations on one host."""
    _require_local_path(table_dir)  # guard EVERY mutating entry point
    os.makedirs(table_dir, exist_ok=True)
    fd = os.open(os.path.join(table_dir, _LOCK), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


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
    # fsync the DIRECTORY too: without it a power loss can forget the
    # rename even though the caller was told the commit succeeded
    dfd = os.open(table_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _reserve_version_dir(table_dir: str) -> tuple[int, str]:
    """Claim the next free version id with an atomic mkdir."""
    manifest = _read_manifest(table_dir)
    committed_max = manifest["versions"][-1]["id"] if manifest["versions"] else -1
    start = committed_max + 1
    vid = start
    while True:
        vdir = os.path.join(table_dir, f"v={vid}")
        try:
            os.mkdir(vdir)  # atomic: exactly one writer wins each id
            return vid, vdir
        except FileExistsError:
            vid += 1


def snapshot_commit(
    df: DataFrame, table_dir: str, note: str = "", precondition=None
) -> int | None:
    """Write ``df`` as the table's next immutable version; returns its id.

    The data write happens entirely inside the reserved ``v=N``
    directory; the commit is the final locked manifest update. A crash
    before that leaves the table untouched (the orphan dir is invisible
    to readers and reclaimable by :func:`vacuum`).

    ``precondition(manifest) -> bool``, when given, is evaluated UNDER
    the manifest lock just before the append: if it returns False the
    commit is abandoned (returns None; the written data becomes a
    vacuum-able orphan). This is the check-and-act primitive the
    exactly-once sink and stream compaction use to stay correct under
    concurrent writers — a check done outside the lock can always be
    invalidated between checking and committing.

    A writer that stalls longer than a concurrent vacuum's
    ``orphan_grace_seconds`` can have its (still uncommitted) version
    directory reclaimed as an orphan; the locked append detects that and
    abandons the commit rather than publishing a manifest entry whose
    data is gone.
    """
    _require_local_path(table_dir)
    os.makedirs(table_dir, exist_ok=True)
    next_id, vdir = _reserve_version_dir(table_dir)
    # APPEND into the freshly reserved (guaranteed-empty) dir: overwrite
    # would first DELETE it, re-opening the reservation race for a
    # concurrent writer to mkdir the same id
    df.write.mode("append").parquet(vdir)
    return _commit_reserved(table_dir, next_id, vdir, note, precondition)


def _commit_reserved(
    table_dir: str, next_id: int, vdir: str, note: str, precondition=None
) -> int | None:
    """The locked manifest append finishing a write into a reserved dir."""
    with _locked(table_dir):
        manifest = _read_manifest(table_dir)  # RE-read under the lock
        if precondition is not None and not precondition(manifest):
            return None  # lost the race; orphan dir left for vacuum
        if not os.path.isdir(vdir):
            # vacuum judged this reservation an idle orphan while the
            # writer was stalled past orphan_grace_seconds — the data is
            # gone, so publishing the entry would break the table's core
            # guarantee (manifest never references deleted data)
            return None
        manifest["versions"].append(
            {"id": next_id, "note": note, "committed_at": time.time()}
        )
        manifest["versions"].sort(key=lambda v: v["id"])
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
    """Re-point ``current`` at an older version (O(1); no data moves)."""
    with _locked(table_dir):
        manifest = _read_manifest(table_dir)
        if version not in {v["id"] for v in manifest["versions"]}:
            raise ValueError(f"unknown snapshot version {version}")
        manifest["current"] = version
        _write_manifest_atomic(table_dir, manifest)


def _is_delta(entry: dict) -> bool:
    note = entry.get("note", "")
    return note.startswith(STREAM_BATCH_PREFIX) or note.startswith(
        STREAM_COMPACT_PREFIX
    )


def _covered_versions(manifest: dict) -> set[int]:
    """Delta versions superseded by a later stream-compact commit."""
    covered: set[int] = set()
    for v in manifest["versions"]:
        note = v.get("note", "")
        if note.startswith(STREAM_COMPACT_PREFIX):
            covered.update(json.loads(note[len(STREAM_COMPACT_PREFIX):])["covers"])
    return covered


def _tree_idle_for(path: str, cutoff_seconds: float) -> bool:
    """True iff NOTHING under ``path`` was modified within the cutoff —
    a long Spark write keeps refreshing _temporary subpaths, so this
    measures writer liveness where the top dir's mtime would lie.
    Early-exits on the first fresh entry (the walk runs under the
    manifest lock; a multi-TB orphan must not stall every committer)."""
    threshold = time.time() - cutoff_seconds
    if os.path.getmtime(path) > threshold:
        return False
    for root, dirs, files in os.walk(path):
        for name in dirs + files:
            try:
                if os.path.getmtime(os.path.join(root, name)) > threshold:
                    return False
            except OSError:
                pass
    return True


def vacuum(
    table_dir: str,
    keep_last: int = 2,
    orphan_grace_seconds: float = 3600.0,
    retention_seconds: float = 3600.0,
) -> list[int]:
    """Reclaim unreferenced data; returns the removed version ids.

    Deletes: superseded full-state versions and covered DELTA versions
    whose commit is older than ``retention_seconds`` (an in-flight
    reader that resolved the manifest earlier may still be scanning a
    just-superseded version — Delta's vacuum retention, same reason),
    and orphaned (never-committed) ``v=`` directories whose newest
    tree mtime is older than ``orphan_grace_seconds`` (a young-or-busy
    orphan may be an in-flight writer's reservation). Uncovered deltas
    are always retained — for a stream table each one is irreplaceable
    data, not a superseded state.
    """
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    now = time.time()
    with _locked(table_dir):
        manifest = _read_manifest(table_dir)
        covered = _covered_versions(manifest)
        full_state = [v["id"] for v in manifest["versions"] if not _is_delta(v)]
        keep = set(full_state[-keep_last:])
        if manifest["current"] is not None:
            keep.add(manifest["current"])
        removable: set[int] = set()
        for v in manifest["versions"]:
            vid = v["id"]
            if vid in keep:
                continue
            if now - v.get("committed_at", 0) < retention_seconds:
                continue  # an earlier-resolved reader may still scan it
            if _is_delta(v):
                if vid in covered:
                    removable.add(vid)
            else:
                removable.add(vid)
        # A compact's covers list is load-bearing metadata: if any version
        # it covers survives this pass (e.g. pinned by keep/current after a
        # rollback), dropping the compact entry would surface the survivor
        # as uncovered and read_stream_table would double-count its rows.
        # Keep such compacts until their whole covered set is gone.
        # Fixpoint because compacts cover earlier compacts transitively.
        by_id = {v["id"]: v for v in manifest["versions"]}
        present = set(by_id)
        demoted = True
        while demoted:
            demoted = False
            for vid in list(removable):
                note = by_id[vid].get("note", "")
                if not note.startswith(STREAM_COMPACT_PREFIX):
                    continue
                covers = set(json.loads(note[len(STREAM_COMPACT_PREFIX):])["covers"])
                if covers & (present - removable):
                    removable.discard(vid)
                    demoted = True
        committed_ids = {v["id"] for v in manifest["versions"]}
        orphans = []
        for entry in os.listdir(table_dir):
            if not entry.startswith("v="):
                continue
            suffix = entry.split("=", 1)[1]
            if not suffix.isdigit():
                continue  # foreign dirs are not ours to judge
            vid = int(suffix)
            if vid not in committed_ids:
                if _tree_idle_for(os.path.join(table_dir, entry), orphan_grace_seconds):
                    orphans.append(vid)
        # manifest first: a crash after this point leaves only orphan
        # dirs (reclaimable), never a manifest referencing deleted data.
        # Batch-id notes of removed deltas survive inside the covering
        # compact entry, so redelivery dedup is preserved.
        manifest["versions"] = [
            v for v in manifest["versions"] if v["id"] not in removable
        ]
        _write_manifest_atomic(table_dir, manifest)
        removed = []
        for vid in sorted(removable | set(orphans)):
            shutil.rmtree(os.path.join(table_dir, f"v={vid}"), ignore_errors=True)
            removed.append(vid)
        return removed
