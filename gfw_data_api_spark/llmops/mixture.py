"""Domain-mixture statistics and sampling weights.

Training corpora are assembled from heterogeneous domains (web, code,
papers, ...) whose raw token masses never match the mixture you want to
train on. The Pile / DoReMi recipe: measure each domain's actual token
share, then attach a per-domain sampling weight that, multiplied into
per-document sampling probability, yields the target mixture in
expectation. This operator computes the measurement + weights; pair it
with ``llmops.sampling.stratified_sample`` (weights → fractions) to
materialize the resampled corpus.

Scale shape: one narrow map (token counting, JVM ``split``/``size``) +
one groupBy(domain) — domains are few, so the aggregate is a tiny
shuffle with full map-side combine; the totals join is a broadcast of a
handful of rows. 100 TB-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# whitespace-token definition shared with text.token_count / the t01 oracle:
# tokens = elements of trim(text) split on runs of whitespace
_TOKENS = "CAST(size(split(trim({col}), '\\\\s+')) AS BIGINT)"


def domain_mixture_stats(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    target: dict[str, float] | None = None,
) -> DataFrame:
    """Per-domain ``(n_docs, n_tokens, token_frac, sample_weight)``.

    ``sample_weight`` = target_frac / actual_token_frac: >1 means the
    domain must be upsampled to reach the target, <1 downsampled.
    Default target is uniform over the observed domains. A ``target``
    dict maps domain → desired fraction (should sum to 1; unlisted
    domains get 0 and a zero weight).

    Float expressions are written in a fixed association
    (``n_tokens/total`` and ``(total·target)/n_tokens``) so an external
    engine evaluating the same SQL reproduces them bit-identically.
    """
    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    per_doc = df.select(
        F.col(domain_col).alias("domain"),
        F.expr(_TOKENS.format(col=text_col)).alias("_nt"),
    )
    # pin the domain table — totals branch + output branch would
    # otherwise each run the corpus token-count scan (same fix as
    # temperature_mixture_weights)
    agg = _persist_replacing(
        per_doc.groupBy("domain").agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
        ),
        "mixture_stats_agg",
    )
    totals = agg.agg(
        F.sum("n_tokens").cast("bigint").alias("_total"),
        F.count("*").alias("_nd"),
    )
    out = agg.join(F.broadcast(totals))
    if target is None:
        # uniform target: target_frac·total = total/nd
        weight = (F.col("_total").cast("double") / F.col("_nd")) / F.col("n_tokens")
    else:
        tmap = F.create_map(
            *[F.lit(x) for kv in target.items() for x in kv]  # k1,v1,k2,v2,...
        )
        tfrac = F.coalesce(tmap[F.col("domain")], F.lit(0.0))
        weight = (F.col("_total").cast("double") * tfrac) / F.col("n_tokens")
    return out.select(
        "domain",
        "n_docs",
        "n_tokens",
        (F.col("n_tokens").cast("double") / F.col("_total")).alias("token_frac"),
        weight.alias("sample_weight"),
    )


def temperature_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled sampling weights: w_d ∝ p_d^alpha.

    The multilingual-training recipe (mBERT/XLM-R exponential smoothing,
    also the Pile's domain temperature): raising each domain's token
    share p_d to alpha < 1 flattens the distribution — low-resource
    domains are upsampled relative to their raw share without going all
    the way to uniform (alpha=0 is uniform, alpha=1 keeps raw shares).

    Output per domain: ``n_docs``, ``n_tokens``, ``token_frac`` (=p_d),
    ``temp_frac`` (=p_d^alpha / Σ p^alpha, the target mixture) and
    ``sample_weight`` (=temp_frac / token_frac, the per-domain
    up/downsampling factor). Same one-tiny-shuffle plan shape as
    :func:`domain_mixture_stats`; the Σ p^alpha normalizer aggregates
    over the domain table (a handful of rows, broadcast back).
    """
    per_doc = df.select(
        F.col(domain_col).alias("domain"),
        F.expr(_TOKENS.format(col=text_col)).alias("_nt"),
    )
    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    # pin the domain table (a handful of rows): the totals scalar, the
    # normalizer scalar, and the output all consume it, and unpinned
    # each branch re-runs the corpus token-count scan (plan audit: 4
    # corpus scans → 1)
    agg = _persist_replacing(
        per_doc.groupBy("domain").agg(
            F.count("*").alias("n_docs"),
            F.sum("_nt").cast("bigint").alias("n_tokens"),
        ),
        "mixture_agg",
    )
    totals = agg.agg(F.sum("n_tokens").cast("bigint").alias("_total"))
    with_frac = agg.join(F.broadcast(totals)).withColumn(
        "token_frac", F.col("n_tokens").cast("double") / F.col("_total")
    )
    norm = with_frac.agg(
        F.sum(F.pow(F.col("token_frac"), F.lit(alpha))).alias("_z")
    )
    return (
        with_frac.join(F.broadcast(norm))
        .withColumn("temp_frac", F.pow(F.col("token_frac"), F.lit(alpha)) / F.col("_z"))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            "token_frac",
            "temp_frac",
            (F.col("temp_frac") / F.col("token_frac")).alias("sample_weight"),
        )
    )
