"""Record linkage: blocked fuzzy matching.

Deduplicating entity tables (supplier/customer registries, the
reference's admin-boundary name matching in
app/routes/political/id_lookup.py generalized to fuzzy matching) needs
approximate string comparison — but Levenshtein over all pairs is
O(n²·len²). The standard shape is BLOCK + VERIFY: a cheap deterministic
blocking key bounds the candidate space, exact edit distance verifies
only within blocks. Both stages are native Catalyst expressions
(``F.levenshtein`` is JVM-side), so the verify stage runs inside
whole-stage codegen.

Scale: candidate pairs are Σ_b n_b² over block sizes, not N² — the same
bounded-quadratic argument as blocked_cosine_pairs / SemDeDup. Block
keys with a hot value (empty names, "UNKNOWN") are the skew hazard;
``max_block_size`` mirrors blocked_cosine_pairs' guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocking_key(col: Column, prefix_len: int = 2) -> Column:
    """Normalized blocking key: lowercase alnum-only prefix + length
    band. Two strings within edit distance d have length difference ≤ d,
    so banding lengths by 4 keeps all ≤2-edit pairs either in one band
    or adjacent bands (callers wanting full recall at distance d probe
    both; the default single-band probe trades that tail for half the
    candidate volume — stated in blocked_fuzzy_match's docstring)."""
    norm = F.lower(F.regexp_replace(col, r"[^A-Za-z0-9]", ""))
    return F.concat_ws(
        "|",
        F.substring(norm, 1, prefix_len),
        (F.length(norm) / 4).cast("int").cast("string"),
    )


def blocked_fuzzy_match(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 2,
    prefix_len: int = 2,
    max_block_size: int | None = 100_000,
) -> DataFrame:
    """(id_a, id_b, distance) for pairs with Levenshtein ≤ ``max_distance``
    that share a blocking key.

    Recall contract: a matching pair is found when both sides share the
    normalized ``prefix_len``-prefix AND fall in the same length band —
    edits inside the prefix or across a band boundary are missed (the
    price of not comparing all pairs; lower ``prefix_len`` or band
    externally to trade cost for recall). Precision is exact: every
    emitted pair truly has edit distance ≤ ``max_distance``.
    """
    keyed = df.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        blocking_key(F.col(text_col), prefix_len).alias("_bk"),
    )
    if max_block_size is not None:
        counts = keyed.groupBy("_bk").agg(F.count("*").alias("_bn"))
        checked = F.coalesce(
            F.assert_true(
                F.col("_bn") <= F.lit(max_block_size),
                F.concat(
                    F.lit(f"blocks exceed max_block_size={max_block_size}: "),
                    F.col("_bk"),
                ),
            ).cast("string"),
            F.col("_bk"),
        )
        keyed = keyed.join(counts, "_bk").withColumn("_bk", checked).drop("_bn")
    # length pre-filter inside the join condition: |len(a)-len(b)| > d
    # implies distance > d, so the O(len²) levenshtein never runs on
    # those pairs — result-identical, pure pruning
    pairs = (
        keyed.alias("a")
        .join(
            keyed.alias("b"),
            (F.col("a._bk") == F.col("b._bk"))
            & (F.col("a._id") < F.col("b._id"))
            & (
                F.abs(F.length(F.col("a._t")) - F.length(F.col("b._t")))
                <= max_distance
            ),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            # thresholded levenshtein (Spark 3.5+): the DP early-exits
            # once the running distance exceeds the bound, returning -1
            # — O(d·len) instead of O(len²) per surviving pair
            F.levenshtein(
                F.col("a._t"), F.col("b._t"), max_distance
            ).alias("distance"),
        )
    )
    return pairs.filter(F.col("distance") >= 0)
