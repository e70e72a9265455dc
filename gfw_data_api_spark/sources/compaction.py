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

from pyspark.sql import DataFrame, SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


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

    In-place = write to a sibling temp dir, then atomically swap (rename)
    — readers of the old listing finish against already-open files; a
    crash mid-swap leaves either the old or the new directory complete.
    """
    plan = plan_compaction(path, target_bytes)
    n_out = plan["n_output_files"]
    df: DataFrame = spark.read.parquet(path)
    if preserve_sort:
        out = df.repartitionByRange(n_out, *preserve_sort).sortWithinPartitions(
            *preserve_sort
        )
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "._compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    # best-effort cleanup of the displaced originals
    import shutil

    shutil.rmtree(old, ignore_errors=True)
    return plan
