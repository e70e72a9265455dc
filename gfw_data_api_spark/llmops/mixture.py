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
    per_doc = df.select(
        F.col(domain_col).alias("domain"),
        F.expr(_TOKENS.format(col=text_col)).alias("_nt"),
    )
    agg = per_doc.groupBy("domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("_nt").cast("bigint").alias("n_tokens"),
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
