"""Benchmark decontamination: flag corpus documents that share n-gram
shingles with a benchmark/eval set — the standard training-data hygiene
pass (the GPT-3/PaLM-style 13-gram overlap check), expressed as the same
inverted-shingle-index join the exact-Jaccard dedup uses, but across two
sets instead of self-joined.

Scale shape: both sides explode to (doc, shingle-hash) rows once; the
join key is the shingle hash (high cardinality, uniform); the benchmark
side is tiny compared to the corpus, so after aggregation the flagged
set broadcasts back for the final anti-join. Work is proportional to
true n-gram overlap — a clean corpus costs one scan + one small shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.dedup import shingles_col


def _shingle_index(df: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(shingles_col(F.col(text_col), n))).alias("_s"),
    ).withColumn("_h", F.xxhash64("_s"))


def contamination_matches(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    min_shared: int = 2,
    max_bench_frequency: int | None = 1000,
) -> DataFrame:
    """(corpus_id, bench_id, n_shared) for pairs sharing ≥ ``min_shared``
    distinct ``shingle_n``-gram shingles.

    ``max_bench_frequency`` drops shingles appearing in more than that
    many BENCHMARK documents before the join: a boilerplate phrase
    shared by the whole benchmark ("answer the following question")
    would otherwise pair every matching corpus doc with every benchmark
    doc — corpus_df × bench_df join rows per shingle. Benchmark-side df
    is the right cap axis because the benchmark is the small side and a
    shingle common across it is instruction boilerplate, not leaked
    content. ``None`` disables."""
    c = _shingle_index(corpus, text_col, id_col, shingle_n)
    b = _shingle_index(benchmark, text_col, id_col, shingle_n)
    if max_bench_frequency is not None:
        # Dropping hot shingles from the BENCHMARK side alone is enough:
        # the pairing join is inner, so a shingle absent from b can never
        # emit a pair regardless of its corpus df. Computing the df as a
        # window over _h keeps it one pass and pre-shuffles b on the join
        # key, so the filter costs a sort within the exchange the join
        # needs anyway — no second index build, no driver action, and no
        # corpus-side pass. (Earlier variants — an eager collect, or
        # agg + two broadcast anti-joins — each measured ~2× end-to-end
        # at bench scale.)
        from pyspark.sql import Window

        b = (
            b.withColumn("_df", F.count("*").over(Window.partitionBy("_h")))
            .filter(F.col("_df") <= max_bench_frequency)
            .drop("_df")
        )
    # explicit broadcast of the benchmark index: the corpus (the 100 TB
    # side) must NEVER shuffle on the shingle hash — with a plain join
    # the optimizer can pick sort-merge once the benchmark's size
    # estimate crosses the threshold, and then a boilerplate corpus
    # shingle that survives the benchmark-side df cap (cap is on BENCH
    # frequency) funnels its millions of corpus rows into one partition.
    # Benchmarks are definitionally driver-scale; a benchmark too big to
    # broadcast should be decontaminated in slices.
    return (
        c.alias("c")
        .join(F.broadcast(b.alias("b")), F.col("c._h") == F.col("b._h"))
        .groupBy(
            F.col("c._id").alias("corpus_id"), F.col("b._id").alias("bench_id")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 5,
    min_shared: int = 2,
    max_bench_frequency: int | None = 1000,
) -> DataFrame:
    """Corpus minus contaminated documents (left_anti on the flagged set).

    The flagged id list is data-dependent and unbounded (tiny on clean
    corpora, huge on heavily contaminated ones), so no broadcast hint is
    forced — AQE broadcasts the anti-join build side only when it
    measures small at runtime."""
    flagged = (
        contamination_matches(
            corpus, benchmark, text_col, id_col, shingle_n, min_shared,
            max_bench_frequency,
        )
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    # no broadcast hint: flagged is data-dependent/unbounded; AQE decides
    return corpus.join(flagged, id_col, "left_anti")
