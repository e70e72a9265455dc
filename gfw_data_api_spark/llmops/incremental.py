"""Incremental near-duplicate dedup: screen a NEW batch against corpus
state without re-reading the corpus.

The production dedup loop is not one-shot — crawls/appends arrive
continuously, and re-running MinHash over 100 TB per batch is absurd.
The state that makes dedup incremental is tiny relative to the corpus:
the per-document MinHash signature table (64×8 bytes/doc). Each batch:

1. sign the new docs (one pass over the batch only),
2. probe: new band-buckets ⋈ historical band-buckets (equi-join on
   hash-uniform keys; the historical side is partitioned by
   (_band, _bucket) at scale so the probe prunes at scan time),
3. new⋈new within the batch (the batch is small — same banded join),
4. survivors' signatures append to the state table.

Identical hash family and banding as the one-shot path
(dedup.minhash_band_buckets), so incremental screening finds EXACTLY
the pairs the full-batch run would — asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.dedup import (
    minhash_band_buckets,
    minhash_signatures,
)


def _est_jaccard(pairs: DataFrame, sig_a: DataFrame, sig_b: DataFrame, num_hashes: int) -> DataFrame:
    est = (
        pairs.join(sig_a.withColumnRenamed("_id", "id_new").withColumnRenamed("_sig", "_sa"), "id_new")
        .join(sig_b.withColumnRenamed("_id", "id_old").withColumnRenamed("_sig", "_sb"), "id_old")
        .withColumn(
            "est_jaccard",
            F.size(F.filter(F.zip_with("_sa", "_sb", lambda x, y: x == y), lambda v: v))
            / F.lit(float(num_hashes)),
        )
    )
    return est.select("id_new", "id_old", F.col("est_jaccard").cast("double"))


def incremental_minhash_candidates(
    new_docs: DataFrame,
    state_sigs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    portable: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """(candidate pairs, new signatures).

    Pairs are (id_new, id_old, est_jaccard) where id_old ranges over the
    historical state AND earlier ids within the batch (so a batch that
    near-duplicates itself is caught too). ``state_sigs`` is the
    persisted ``(_id, _sig)`` table from previous runs (empty on the
    first run). ``portable=True`` signs the batch with the md5-affine
    family (dedup.minhash_signatures_portable — the d04/d13 oracle
    family); the state must have been signed with the SAME family.

    The returned signature DataFrame is ``persist()``-ed (it feeds both
    the band join and the verify step); long-lived callers looping over
    batches should ``unpersist()`` it once the batch's outputs are
    materialized, or periodically ``spark.catalog.clearCache()`` —
    same contract as the d03 shingle index.
    """
    from gfw_data_api_spark.llmops.dedup import (
        _persist_replacing,
        minhash_signatures_portable,
    )

    sign = minhash_signatures_portable if portable else minhash_signatures
    new_sigs = _persist_replacing(
        sign(new_docs, text_col, id_col, num_hashes, shingle_n),
        "incremental_new_sigs",
    )
    # portable propagates to banding too: raw comma-joined band keys,
    # matching minhash_lsh_candidates_portable exactly (an xxhash64
    # compression here could — with ~2^-64 probability — emit a pair the
    # one-shot portable run and the d13 oracle would not)
    new_bands = minhash_band_buckets(new_sigs, num_hashes, bands, portable=portable)
    old_bands = minhash_band_buckets(state_sigs, num_hashes, bands, portable=portable)

    vs_old = (
        new_bands.alias("a")
        .join(
            old_bands.alias("b"),
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket")),
        )
        .select(F.col("a._id").alias("id_new"), F.col("b._id").alias("id_old"))
        .distinct()
    )
    vs_new = (
        new_bands.alias("a")
        .join(
            new_bands.alias("b"),
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._bucket") == F.col("b._bucket"))
            & (F.col("a._id") > F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_new"), F.col("b._id").alias("id_old"))
        .distinct()
    )
    pairs = _est_jaccard(vs_old, new_sigs, state_sigs, num_hashes).unionByName(
        _est_jaccard(vs_new, new_sigs, new_sigs, num_hashes)
    )
    return pairs, new_sigs


def append_dedup(
    new_docs: DataFrame,
    state_sigs: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """(clean new docs, updated state).

    Drops new docs whose estimated Jaccard against ANY historical doc or
    any earlier-id batch doc reaches ``threshold`` (first-writer-wins,
    matching streaming/stateful.py semantics); returns the surviving
    docs and the state table with their signatures appended.
    """
    pairs, new_sigs = incremental_minhash_candidates(
        new_docs, state_sigs, text_col, id_col, num_hashes, bands, shingle_n
    )
    dropped = (
        pairs.filter(F.col("est_jaccard") >= threshold)
        .select(F.col("id_new").alias("_drop_id"))
        .distinct()
    )
    clean = new_docs.join(
        dropped, new_docs[id_col] == dropped["_drop_id"], "left_anti"
    )
    kept_sigs = new_sigs.join(
        dropped, new_sigs["_id"] == dropped["_drop_id"], "left_anti"
    )
    return clean, state_sigs.unionByName(kept_sigs)
