"""End-to-end corpus curation: the composed training-data pipeline.

The standard pre-training data flow (C4 / Gopher / RefinedWeb publish
the recipe) chains: quality filters → language filter → exact dedup →
benchmark decontamination. Each stage exists here as an independent,
oracle-gated operator; this module composes them into one lazy plan so
Catalyst sees the WHOLE pipeline at once — filters reorder ahead of the
expensive dedup shuffle, column pruning reaches the scan, and the only
wide operations are the dedup groupBy and the decontamination join.

Scale shape per 100 TB run: two narrow filter map-stages, one shuffle
on md5(text) (exact dedup), one inverted-shingle join against the
(tiny, broadcast-aggregated) benchmark. Nothing quadratic, nothing
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.decontaminate import contamination_matches
from gfw_data_api_spark.llmops.text import tokens_col


def curate_corpus(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str | None = "lang",
    keep_langs: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_top_word_frac: float = 0.2,
    shingle_n: int = 5,
    min_shared: int = 2,
) -> DataFrame:
    """Kept documents with their quality signals attached.

    Stages (all lazy, one plan):
    1. token-count window filter  [min_tokens, max_tokens]
    2. repetition filter           top-word fraction ≤ max_top_word_frac
    3. language filter             lang ∈ keep_langs (skipped if no col)
    4. exact dedup                 keep the smallest id per md5(text)
    5. decontamination             drop docs sharing ≥ min_shared
                                   shingles with any benchmark doc
    """
    text = F.col(text_col)
    toks = tokens_col(text)

    n_tokens = F.size(toks)
    staged = corpus.withColumn("n_tokens", n_tokens.cast("bigint")).filter(
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    )

    # top-word fraction without a second shuffle: aggregate the sorted
    # token array per row (sort groups equal tokens into runs; the max
    # run length is the top-word count) — O(len log len) per row, narrow
    sorted_toks = F.array_sort(toks)
    run_struct = F.aggregate(
        sorted_toks,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(x == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    staged = staged.withColumn(
        "top_word_frac",
        F.round(run_struct.best / F.col("n_tokens"), 6),
    ).filter(F.col("top_word_frac") <= max_top_word_frac)

    if lang_col is not None and lang_col in corpus.columns:
        staged = staged.filter(F.col(lang_col).isin(*keep_langs))

    # exact dedup: smallest id per content hash, one shuffle
    w = Window.partitionBy(F.md5(text)).orderBy(F.col(id_col))
    staged = (
        staged.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )

    # pin the staged survivors: the contamination index and the anti-join
    # probe both consume them, and unpinned each branch re-runs the
    # filter + dedup window over the corpus (plan-audit finding)
    from gfw_data_api_spark.llmops.dedup import _persist_replacing

    staged = _persist_replacing(staged, "curate_staged")

    flagged = (
        contamination_matches(
            staged, benchmark, text_col, id_col, shingle_n, min_shared
        )
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    # no broadcast hint: the flagged set is data-dependent and unbounded
    # (benchmark-overlap-sized on toy data, but billions of ids at 100 TB);
    # AQE broadcasts it only when it measures small
    return staged.join(flagged, id_col, "left_anti")
