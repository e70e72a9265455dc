"""Tokenizer-training statistics: adjacent-pair frequency (the BPE inner
loop's counting step).

Byte-pair encoding repeatedly merges the most frequent adjacent symbol
pair. The expensive, data-parallel part of training is the pair count
over the corpus; the merge itself is a tiny driver-side decision. This
module provides the corpus-scale counting step as a declarative plan:
explode every adjacent character pair, count, rank. Iterating
count→merge→re-segment is then a driver loop over cheap Spark jobs
(the same shape as the IVF k-means recipe in llmops/ivf.py).

Scale shape: explode is a narrow map (one row per character — the same
cost class as shingling in llmops/dedup.py); the count is a hash
aggregate on a key space capped by |alphabet|² with full map-side
combine, so the shuffle carries at most a few thousand rows per
partition regardless of corpus size. Top-k uses TakeOrdered — no global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_pair_stats(
    df: DataFrame, text_col: str = "text", top_k: int | None = None
) -> DataFrame:
    """(pair, cnt) for every adjacent character pair in ``text_col``.

    Ties in ``top_k`` mode break lexicographically on the pair so the
    result is deterministic across engines and partitionings.
    """
    pairs = (
        df.filter(F.length(F.col(text_col)) >= 2)
        .select(
            F.explode(
                F.sequence(F.lit(1), F.length(F.col(text_col)) - 1)
            ).alias("_i"),
            F.col(text_col).alias("_t"),
        )
        .select(F.expr("substring(_t, _i, 2)").alias("pair"))
    )
    counts = pairs.groupBy("pair").agg(F.count("*").alias("cnt"))
    if top_k is not None:
        counts = counts.orderBy(F.col("cnt").desc(), F.col("pair").asc()).limit(top_k)
    return counts
