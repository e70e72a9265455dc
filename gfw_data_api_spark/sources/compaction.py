"""Small-file compaction: rewrite a parquet directory to task-sized files.

The chronic 100 TB operational problem: streaming appends, incremental
refreshes, and per-partition writers leave thousands of KB-scale files;
every subsequent scan pays per-file open/footer costs and the driver
pays per-file listing/planning memory. The lakehouse answer (Delta
OPTIMIZE / Iceberg rewrite_data_files) is a bin-packing rewrite. Here:
measure actual on-disk bytes, choose ``ceil(bytes / target)`` output
files, and rewrite with a round-robin repartition (no key skew — it is
a layout operation, not a semantic one). ``preserve_sort`` re-sorts
within files when the table relies on 1-D clustering (E9) or z-order
(sources/layout.py) for data skipping, since a round-robin repack would
destroy the min/max locality those layouts bought.

The rewrite is full-scan + full-write of the chosen partitions — the
same cost class the lakehouse tools pay; run it per partition directory
(e.g. per day) so one compaction never touches more than a bounded
slice of the table.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def _require_local_path(path: str) -> None:
    """These rewrite helpers manipulate directories with os.rename, which
    only exists on a local filesystem. Fail fast on URI schemes rather
    than after a full rewrite (object stores need the metadata-layer
    commit a lakehouse format provides)."""
    if "://" in path and not path.startswith("file://"):
        raise ValueError(
            f"in-place rewrite requires a local path, got {path!r}"
        )


def recover_swap(path: str) -> None:
    """Heal a crashed swap: if only ``<path>._swap_old`` exists, restore
    it; a leftover old dir beside a live ``path`` is deleted."""
    old = path.rstrip("/") + "._swap_old"
    if os.path.exists(old):
        if os.path.exists(path):
            shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(old, path)
    tmp = path.rstrip("/") + "._swap_tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp, ignore_errors=True)


def swap_directory(path: str, write) -> None:
    """Replace the directory at ``path`` with freshly-written content.

    ``write(tmp_path)`` materializes the replacement into a sibling temp
    dir; then two renames swap it in. The window between the renames is
    NOT atomic — a crash there leaves ``path`` absent with the old data
    parked at ``<path>._swap_old``, which :func:`recover_swap` (invoked
    at the start of every swap) restores on the next run. True
    atomicity needs a metadata layer (Delta/Iceberg commit); this is
    the honest filesystem approximation.
    """
    _require_local_path(path)
    recover_swap(path)
    tmp = path.rstrip("/") + "._swap_tmp"
    old = path.rstrip("/") + "._swap_old"
    write(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old, ignore_errors=True)


def measure_files(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a parquet directory tree."""
    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, name))
    return n, total


def plan_compaction(
    path: str, target_bytes: int = DEFAULT_TARGET_BYTES
) -> dict[str, int]:
    """Decide the output file count from measured bytes (no data read)."""
    n_files, total = measure_files(path)
    n_out = max(1, math.ceil(total / target_bytes))
    return {"n_files": n_files, "total_bytes": total, "n_output_files": n_out}


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    preserve_sort: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite ``path`` in place to ~``target_bytes`` files; returns the plan.

    In-place = write to a sibling temp dir, then swap via
    :func:`swap_directory` (crash recovery semantics documented there).
    Readers of the old listing finish against already-open files.
    """
    _require_local_path(path)
    # heal a crashed previous swap BEFORE measuring/reading: the data may
    # still be parked at ._swap_old with nothing at `path`
    recover_swap(path)
    plan = plan_compaction(path, target_bytes)
    n_out = plan["n_output_files"]
    df: DataFrame = spark.read.parquet(path)
    if preserve_sort:
        out = df.repartitionByRange(n_out, *preserve_sort).sortWithinPartitions(
            *preserve_sort
        )
    else:
        out = df.repartition(n_out)
    swap_directory(path, lambda tmp: out.write.mode("overwrite").parquet(tmp))
    return plan
