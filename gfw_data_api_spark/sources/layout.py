"""Z-order (Morton-curve) physical layout for multi-dimensional data
skipping.

``cluster_on`` (sources/tabular.py) gives one-dimensional clustering:
parquet min/max stats act like a clustered index on the leading sort
column, but a predicate on any OTHER column still scans every file. The
lakehouse answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``) interleaves the
bits of several columns into one Morton key and range-partitions + sorts
by it, so every file covers a tight hyper-rectangle in ALL the z-ordered
dimensions and min/max stats prune scans for predicates on any of them.

Everything is native column math (rank → fixed-point bucket → bit
interleave as an unrolled expression): the key computation runs in
whole-stage codegen, the layout costs exactly one range-exchange + local
sort — the same price as a plain ``ORDER BY`` write.

The reference's analog is its CLUSTER-on-index step
(batch/scripts/cluster_partitions.sh — one-dimensional only); z-order is
the beyond-reference scale path for the 100 TB multi-predicate case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered"]

#: bits per dimension; k dimensions use k*BITS total (≤ 62 keeps the
#: interleaved key inside a positive BIGINT)
_MAX_TOTAL_BITS = 62


def _bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Min-max scale a numeric column to an integer in [0, 2^bits)."""
    span = hi - lo
    if span <= 0:  # constant column: every row maps to bucket 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit((1 << bits) - 1)
    return F.least(
        F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit((1 << bits) - 1)
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits_per_dim: int | None = None
) -> Column:
    """Morton-interleaved key over ``cols`` as a native BIGINT expression.

    Numeric columns are min-max bucketed to ``bits_per_dim`` bits (the
    min/max come from one cheap driver-side aggregate — the only
    non-lazy step); string columns are bucketed by ``xxhash64`` (hash
    order is as good as any for skipping on equality predicates). Bits
    are interleaved round-robin so early bits of every dimension carry
    equal weight — the property that makes one file tight in all
    dimensions at once.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    k = len(cols)
    bits = bits_per_dim or (_MAX_TOTAL_BITS // k)
    if bits * k > _MAX_TOTAL_BITS:
        raise ValueError(f"{k} dims × {bits} bits exceeds {_MAX_TOTAL_BITS}")
    numeric = {
        f.name: f
        for f in df.schema.fields
        if f.name in cols and f.dataType.typeName() in
        {"byte", "short", "integer", "long", "float", "double", "decimal", "date", "timestamp"}
    }
    stats_exprs = []
    for c in cols:
        if c in numeric:
            stats_exprs += [
                F.min(F.col(c).cast("double")).alias(f"_lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"_hi_{c}"),
            ]
    bounds = df.agg(*stats_exprs).collect()[0] if stats_exprs else None
    dims: list[Column] = []
    for c in cols:
        if c in numeric:
            dims.append(
                _bucketize(
                    F.col(c), bounds[f"_lo_{c}"], bounds[f"_hi_{c}"], bits
                )
            )
        else:
            dims.append(
                F.pmod(F.xxhash64(F.col(c)), F.lit(1 << bits)).cast("long")
            )
    # unrolled interleave: output bit (b*k + i) = bit b of dimension i
    parts = []
    for i, d in enumerate(dims):
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftrightunsigned(d, b).bitwiseAND(F.lit(1)), b * k + i
                )
            )
    key = parts[0]
    for p in parts[1:]:
        key = key.bitwiseOR(p)
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet z-ordered on ``cols``: range-partition on the Morton
    key (each output file covers a contiguous z-range = a tight
    hyper-rectangle), then sort within partitions so row groups inside a
    file are tight too."""
    key = zorder_key(df, cols)
    tagged = df.withColumn("_z", key)
    if num_files:
        tagged = tagged.repartitionByRange(num_files, "_z")
    else:
        tagged = tagged.repartitionByRange("_z")
    tagged.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)
