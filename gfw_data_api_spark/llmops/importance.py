"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection via Importance Resampling (Xie et al., 2023): score every
raw document by how much more likely its hashed-token features are under
a target distribution (e.g. curated text) than under the raw-corpus
distribution, then resample proportionally. The full recipe is two
bag-of-hashed-ngrams models + a per-document log-likelihood ratio.

Scale shape: one explode(tokens) pass over the corpus; the two feature
distributions are ``num_buckets``-row aggregates (tiny — broadcast back);
the per-document score is one groupBy(doc). No pairwise anything; work is
linear in corpus tokens. The bucket hash is md5-derived (not xxhash64) so
external engines can reproduce the assignment bit-for-bit
(same convention as llmops.sampling.hash_split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def _bucket(col: Column, num_buckets: int) -> Column:
    """First 15 hex chars of md5 (60 bits, exact in a BIGINT) mod buckets —
    portable: ``('0x'||substr(md5(x),1,15))::BIGINT % B`` elsewhere."""
    h = F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(num_buckets))


def hashed_token_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
) -> DataFrame:
    """(``id_col``, bucket) — one row per whitespace token occurrence."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_tok"),
    )
    return tok.select(id_col, _bucket(F.col("_tok"), num_buckets).alias("bucket"))


def bucket_counts(tokens: DataFrame) -> DataFrame:
    """(bucket, cnt) feature distribution from ``hashed_token_buckets`` rows."""
    return tokens.groupBy("bucket").agg(F.count("*").alias("cnt"))


def importance_scores(
    corpus: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log-importance: ``sum_tokens log p_target(b)/p_raw(b)``
    with add-``alpha`` smoothing over ``num_buckets`` features.

    ``target_filter`` selects the in-domain exemplar rows *from the corpus
    itself* (e.g. ``F.col("lang") == "en"``); pass a pre-filtered external
    DataFrame through :func:`importance_scores_vs` when the target set is a
    separate curated corpus.

    Returns (id, n_tokens, log_importance). The log-space sum is float and
    associativity-dependent — for an engine-exact cross-check use
    :func:`hashed_count_features`, whose outputs are exact integers.
    """
    return importance_scores_vs(
        corpus, corpus.filter(target_filter), text_col, id_col, num_buckets, alpha
    )


def importance_scores_vs(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    tok = hashed_token_buckets(corpus, text_col, id_col, num_buckets)
    raw_counts = bucket_counts(tok)
    tgt_counts = bucket_counts(
        hashed_token_buckets(target, text_col, id_col, num_buckets)
    )
    raw_total = raw_counts.agg(F.sum("cnt").alias("_rt"))
    tgt_total = tgt_counts.agg(F.sum("cnt").alias("_tt"))
    # dense per-bucket log-ratio table: `num_buckets` rows → broadcast join
    ratios = (
        raw_counts.withColumnRenamed("cnt", "_rc")
        .join(tgt_counts.withColumnRenamed("cnt", "_tc"), "bucket", "full_outer")
        .na.fill({"_rc": 0, "_tc": 0})
        .join(F.broadcast(raw_total))
        .join(F.broadcast(tgt_total))
        .select(
            "bucket",
            # coalesce the totals: an EMPTY target/raw side aggregates
            # sum(cnt) to NULL, which would silently NULL every score;
            # with 0 the expression degrades to the pure add-alpha prior
            (
                F.log(
                    (F.col("_tc") + alpha)
                    / (F.coalesce(F.col("_tt"), F.lit(0)) + alpha * num_buckets)
                )
                - F.log(
                    (F.col("_rc") + alpha)
                    / (F.coalesce(F.col("_rt"), F.lit(0)) + alpha * num_buckets)
                )
            ).alias("_logratio"),
        )
    )
    return (
        tok.join(F.broadcast(ratios), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_logratio").alias("log_importance"),
        )
    )


def hashed_count_features(
    corpus: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int = 1024,
) -> DataFrame:
    """Engine-exact integer core of the importance score.

    Per document: ``sum_target`` = Σ over its tokens of the TARGET-set
    count of the token's bucket; ``sum_raw`` likewise over the whole
    corpus; plus one smoothed ratio ``(1+sum_target)/(1+sum_raw)`` as a
    single float division. All sums are exact BIGINTs, so any engine
    evaluating the same definition agrees bit-for-bit — this is the
    correctness-gate twin of :func:`importance_scores` (which adds logs,
    whose float association is engine-dependent).
    """
    # the token relation feeds both the raw distribution and the per-doc
    # join — persist so the explode runs once (same pattern as the d03
    # shingle index; at 100 TB this is a disk-backed intermediate, or
    # recompute if storage is tighter than CPU)
    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    tok = _persist_replacing(
        hashed_token_buckets(corpus, text_col, id_col, num_buckets), "dsir_tok"
    )
    raw_counts = bucket_counts(tok).withColumnRenamed("cnt", "_rc")
    tgt_counts = bucket_counts(
        hashed_token_buckets(corpus.filter(target_filter), text_col, id_col, num_buckets)
    ).withColumnRenamed("cnt", "_tc")
    # NOTE: tok stays persisted for the session (it feeds two branches);
    # loop-heavy callers should clearCache() between corpora.
    joined = (
        tok.join(F.broadcast(raw_counts), "bucket")
        .join(F.broadcast(tgt_counts), "bucket", "left")
        .na.fill({"_tc": 0})
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.sum("_tc").cast("bigint").alias("sum_target"),
        F.sum("_rc").cast("bigint").alias("sum_raw"),
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "sum_target",
        "sum_raw",
        (
            (F.lit(1.0) + F.col("sum_target")) / (F.lit(1.0) + F.col("sum_raw"))
        ).alias("target_ratio"),
    )
