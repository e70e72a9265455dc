"""Hashed-n-gram linear text classifier (fastText-style) scoring.

The curation stages this repo already covers (Gopher rules, KN-LM
perplexity, CCNet buckets) are rule- or LM-based; production pipelines
also score documents with a TRAINED linear classifier over hashed
bag-of-n-gram features — fastText's architecture (Joulin et al. 2016,
"Bag of Tricks for Efficient Text Classification") and the quality
filters in GPT-3/LLaMA-style curation. This module implements the
SCORING side Spark-first:

- features = word unigrams + bigrams of the lowercased text (bigrams
  contain a space, unigrams cannot — the spaces-split guarantees the
  two families never collide);
- each feature hashes into one of ``dim`` buckets with the repo's one
  canonical 60-bit md5 formula (llmops/sampling.py), so an external
  engine can replay bucketing exactly;
- score = Σ weight[bucket] over all features (multiplicity counted).

Weights are INTEGER milli-units: summing ints is exact and
order-independent, so the score is bit-reproducible across engines and
across shuffles — no float-accumulation drift. Callers pass a trained
weight table (``weights=[...]``, one int per bucket, broadcast into
the plan as an array literal and indexed per feature); without one,
a deterministic md5-derived pseudo-weight table stands in — the
documented bootstrap/fixture mode the t24 gate replays in DuckDB.

Scale shape: the whole scorer is per-row array math inside one
projection — tokenize, slice/zip_with for bigrams, transform for
hash+weight, aggregate for the sum. ZERO shuffles, zero Python, zero
explodes; at 100 TB it is a map-only pass whose cost is the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.text import tokens_col

_SEP = "\x1f"


def _bucket60(payload: Column, dim: int, seed: int) -> Column:
    """The repo's canonical 60-bit md5 bucket (llmops/sampling.py):
    first 15 hex chars of md5 → BIGINT → % dim."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(payload, F.lit(_SEP + str(seed)))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % dim
    )


def _pseudo_weight_milli(bucket: Column) -> Column:
    """Deterministic stand-in weight table: milli-weight in
    [-1000, 1000] derived from the bucket id by the same canonical
    hash ('w:' prefix keeps it independent of the bucketing hash)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("w:"), bucket.cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % 2001
        - 1000
    )


def ngram_features(text: Column) -> Column:
    """Word unigrams + bigrams of the lowercased text, one array —
    the fastText feature family. Bigrams join with a single space, so
    the two families cannot collide (tokens are whitespace-split)."""
    toks = tokens_col(F.lower(text))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.when(n >= 2, F.concat(toks, bigrams)).otherwise(toks)


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    dim: int = 1024,
    seed: int = 0,
    weights: list[int] | None = None,
    out_col: str = "score_milli",
) -> DataFrame:
    """Append ``n_features`` and the exact integer linear score
    ``out_col`` (milli-units) to ``df``.

    ``weights``: the trained model — one INTEGER milli-weight per
    bucket (``len(weights) == dim``), inlined into the plan as an
    array literal and indexed per feature (a dim-sized literal is a
    few KB in the plan; the executor never shuffles it). Without it,
    the md5-derived pseudo-weight table applies (bootstrap/fixture
    mode; the t24 gate replays it in DuckDB).

    The score is Σ over features (with multiplicity) of the bucket's
    milli-weight — integer arithmetic end to end, so results are
    independent of row order, partitioning, and engine. Convert to a
    probability downstream (``1/(1+exp(-score/1000/n))``) only where
    float drift is acceptable; the integer score is the stable key.
    """
    if weights is not None:
        if len(weights) != dim:
            raise ValueError(
                f"weights table has {len(weights)} entries for dim={dim}"
            )
        if not all(isinstance(w, int) for w in weights):
            raise ValueError(
                "weights must be INTEGER milli-units — float weights would "
                "make the score order-dependent; scale and round upstream"
            )
        table = F.array(*[F.lit(w).cast("bigint") for w in weights])

        def weight_of(bucket: Column) -> Column:
            return F.element_at(table, (bucket + 1).cast("int"))

    else:
        weight_of = _pseudo_weight_milli

    feats = ngram_features(F.col(text_col))
    per_feature = F.transform(feats, lambda f: weight_of(_bucket60(f, dim, seed)))
    return df.withColumn("n_features", F.size(feats).cast("bigint")).withColumn(
        out_col,
        F.aggregate(
            per_feature, F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ),
    )
