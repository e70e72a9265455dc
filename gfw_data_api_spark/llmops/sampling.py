"""Deterministic, reproducible sampling for training-data pipelines.

Train/eval splits and per-stratum downsampling at corpus scale must be
(a) reproducible run-to-run and machine-to-machine, (b) stable under
re-partitioning and appends (a document's split must never depend on
which executor saw it or what else is in the corpus), and (c) free —
no shuffle, no sort, no sampling state. The standard trick delivers all
three: bucket each row by a cryptographic hash of its id + seed and
keep the buckets below the target fraction. ``df.sample()`` gives none
of these guarantees (partition-order dependent), which is why
hash-bucket sampling is the norm in large-scale corpus curation.

The bucket hash is md5-derived (not xxhash64) so external engines
compute bit-identical buckets: the DuckDB oracle pair reproduces every
assignment exactly, and a downstream system in another stack can
re-derive the same split.

Everything here is a pure narrow filter/projection: zero shuffles at
any scale, predicate applied right after the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "stratified_sample",
    "deterministic_sample",
    "leakage_free_split",
    "group_cap_sample",
]

# Unit separator keeps ("1", "23") and ("12", "3") from colliding when
# id and seed are concatenated.
_SEP = "\x1f"


def deterministic_sample(df: DataFrame, col: str, n: int) -> list:
    """Driver-side sample of ``col`` values that does not depend on
    partition count or scan order: the lowest-``n`` rows by content hash
    (``orderBy + limit`` plans as TakeOrdered — a per-partition top-n
    then a driver merge, never a global sort). Driver-trained models
    (BPE merges, PQ codebooks, IVF centroids) sample through this so
    retraining on a repartitioned copy of the same data reproduces the
    model bit-for-bit. Content ties get a secondary sort on the value
    itself, so even a 64-bit hash collision at the cut line cannot make
    the returned multiset run-dependent.

    The hash and the tiebreak both operate on the column's NATIVE type
    (xxhash64 and ordering support arrays directly) — casting a
    64-float embedding to string for hashing measured ~4× slower on the
    sample scan, all of it string materialization."""
    value = F.col(col)
    return [
        r[0]
        for r in df.select(col)
        .orderBy(F.xxhash64(value), value)
        .limit(n)
        .collect()
    ]


def hash_bucket(col: Column, seed: int = 0, buckets: int = 1000) -> Column:
    """Uniform deterministic bucket in [0, buckets) from a column + seed.

    First 15 hex chars of md5 (60 bits — fits a BIGINT exactly) mod
    ``buckets``. Portable: DuckDB's
    ``('0x' || substr(md5(x || chr(31) || seed), 1, 15))::BIGINT %
    buckets`` yields the identical bucket.
    """
    return F.pmod(_portable_hash60(col, seed), F.lit(buckets))


def _portable_hash60(col: Column, seed: int = 0) -> Column:
    """THE canonical portable 60-bit uniform integer: first 15 hex chars
    of ``md5(value || chr(31) || seed)`` as BIGINT. Every md5-derived
    randomness in this module (buckets, splits, weighted draws) goes
    through this one construction so engines and oracles replay it with
    a single formula: ``('0x' || substr(md5(x || chr(31) || seed), 1,
    15))::BIGINT``."""
    payload = F.concat_ws(_SEP, col.cast("string"), F.lit(str(seed)))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("bigint")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    eval_fraction: float = 0.1,
    seed: int = 0,
    train_label: str = "train",
    eval_label: str = "eval",
) -> DataFrame:
    """Assign every row a reproducible train/eval split label.

    A row's label is a pure function of (id, seed): stable across runs,
    partitionings, and appends — new documents never flip old ones
    between splits (the property that keeps eval sets uncontaminated as
    a corpus grows).
    """
    if not 0.0 <= eval_fraction <= 1.0:
        raise ValueError(f"eval_fraction must be in [0, 1], got {eval_fraction}")
    bucket = hash_bucket(F.col(id_col), seed=seed, buckets=1000)
    threshold = int(round(eval_fraction * 1000))
    return df.withColumn(
        "split",
        F.when(bucket < F.lit(threshold), F.lit(eval_label)).otherwise(
            F.lit(train_label)
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep a per-stratum deterministic fraction of rows.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    keep ``default_fraction``. This is the corpus-mixing primitive
    (e.g. downsample boilerplate-heavy sources, upweight rare
    languages by downsampling everything else) — applied as a single
    narrow filter, so at 100 TB it is exactly one pass over the scan
    with the predicate pushed to the parquet reader.

    The bucket is salted with the stratum value so re-using a seed
    across strata does not correlate their keep sets.
    """
    for stratum, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {stratum!r} must be in [0, 1], got {frac}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0, 1], got {default_fraction}")
    bucket = hash_bucket(
        F.concat_ws(_SEP, F.col(id_col).cast("string"), F.col(strata_col)),
        seed=seed,
        buckets=1000,
    )
    threshold: Column = F.lit(int(round(default_fraction * 1000)))
    for stratum, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == F.lit(stratum), F.lit(int(round(frac * 1000)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def leakage_free_split(
    df: DataFrame,
    near_dup_pairs: DataFrame,
    id_col: str = "doc_id",
    eval_fraction: float = 0.1,
    seed: int = 0,
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Train/eval split that never separates near-duplicates.

    Plain :func:`hash_split` leaks: a near-duplicate pair split across
    train and eval inflates eval scores (the model saw the "other copy").
    Here the split key is the near-dup CLUSTER representative (connected
    components over ``near_dup_pairs``, llmops/components.py), so every
    document in a cluster lands in the same split; singletons fall back
    to their own id — identical to hash_split for unpaired docs.

    Scale shape: components is O(log n) rounds over the PAIRS (orders of
    magnitude smaller than the corpus); attaching representatives is one
    left join on the doc id; the split itself stays a pure hash —
    appends never flip old assignments unless new evidence merges their
    clusters (exactly the semantics you want: yesterday's eval doc that
    turns out to near-dup a train doc MUST move).
    """
    from gfw_data_api_spark.llmops.components import connected_components

    comp = connected_components(near_dup_pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("component").alias("_rep")
    )
    with_rep = df.join(comp, id_col, "left").withColumn(
        "_split_key", F.coalesce(F.col("_rep"), F.col(id_col))
    )
    # delegate to hash_split on the representative so the two split paths
    # share one bucket/threshold/validation policy by construction
    return hash_split(
        with_rep, id_col="_split_key", eval_fraction=eval_fraction, seed=seed
    ).drop("_rep", "_split_key")


def group_cap_sample(
    df: DataFrame,
    group_col: str,
    max_per_group: int,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Keep at most ``max_per_group`` rows per group, deterministically.

    The corpus-assembly cap ("no domain contributes more than N
    documents") — the hard-limit sibling of stratified_sample's
    fractional thinning. Rank within each group by the md5 content hash
    of (id, seed) with the id itself as tiebreak, so the surviving
    subset is a pure function of the data: stable across runs,
    partitionings, and (for surviving ids) appends that don't change
    their hash rank. Engine-portable: DuckDB reproduces the identical
    ordering from the same md5 hex string.

    Scale: one shuffle on ``group_col``; a hot group ranks inside its
    partitions via the window — for groups so large their rank sort
    spills, cap earlier at ingest with stratified_sample.
    """
    from pyspark.sql import Window

    if max_per_group < 1:
        raise ValueError(f"max_per_group must be >= 1, got {max_per_group}")
    rank_key = F.md5(
        F.concat_ws(_SEP, F.col(id_col).cast("string"), F.lit(str(seed)))
    )
    w = Window.partitionBy(group_col).orderBy(rank_key, F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_per_group)
        .drop("_rk")
    )


def weighted_sample_without_replacement(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the
    Efraimidis–Spirakis A-ES scheme): each row gets key
    ``ln(u) / w`` with ``u`` a hash-derived uniform in (0, 1], and the
    top-k keys ARE a weighted sample without replacement — the one-pass,
    shuffle-light construction mixture pipelines use to draw
    quality-weighted subsets.

    Determinism: ``u`` comes from the module's one canonical 60-bit md5
    integer (:func:`_portable_hash60`, ``u = (h + 1) / 2^60``), so the
    drawn set is a pure function of (ids, weights, seed) — stable across
    partitioning, cluster size, and engines; reruns and ablations see
    the same sample.

    Scale shape: a narrow map computes keys, then ``orderBy().limit(k)``
    compiles to TakeOrdered — per-partition top-k heaps and a k-row
    merge on the driver, no global sort, no window. Rows with NULL,
    NaN, or non-positive weight are excluded (zero selection
    probability in the scheme — and NaN must be screened explicitly
    because Spark sorts NaN above every double).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col)
    u = (_portable_hash60(F.col(id_col), seed) + F.lit(1)) / F.lit(float(2**60))
    key = F.log(u) / w
    return (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").desc())
        .limit(k)
        .drop("_wkey")
    )


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Deterministic training-order shuffle for epoch ``seed``.

    Orders the corpus by ``md5(seed || ':' || id)`` — a different but
    fully reproducible permutation per epoch, stable across cluster
    sizes, partitioning, and engines (the property a training run needs
    for resumability and ablation reruns; random() gives none of them).

    Scale shape: one range-partitioned sort on the hash key — Spark
    samples key quantiles and writes globally ordered output without
    any single-task bottleneck. No global row_number (an unpartitioned
    window would serialize); consumers that need positions take them
    from the written file order.
    """
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    return df.withColumn(key_col, key).orderBy(key_col, id_col)
