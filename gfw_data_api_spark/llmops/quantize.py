"""Embedding quantization: per-vector symmetric int8.

The standard memory lever for billion-vector ANN stores (FAISS SQ8 /
ScaNN asymmetric hashing publish the recipe): each vector gets one
scale = max|x|/127, elements become round(x/scale) in [-127, 127] —
4× smaller than float32 with ~1e-2 cosine error at D≈100.

Everything is native higher-order functions (transform / aggregate) —
quantizing 100 TB of embeddings is a narrow, codegen'd map stage.
Rounding is floor(x + 0.5) rather than round(): SQL round() half-way
conventions differ across engines, floor is bit-identical everywhere
(and the convention chosen matters less than both sides agreeing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_col(emb: Column, qmax: int) -> Column:
    absmax = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    )
    # all-zero vectors keep scale 1 so q = x = 0 (no divide-by-zero)
    return F.when(absmax == 0.0, F.lit(1.0)).otherwise(absmax / qmax)


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """→ (id, scale, qvec array<int>, original columns dropped)."""
    qmax = (1 << (bits - 1)) - 1
    emb = F.col(emb_col)
    scale = _scale_col(emb, qmax)
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        F.transform(
            emb,
            lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
        ).alias("qvec"),
    )


def quantization_report(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
) -> DataFrame:
    """Scalar per-vector quantization diagnostics (hash-comparable):
    scale, ||q||² (int), and the max reconstruction error |x − q·scale|.
    """
    qmax = (1 << (bits - 1)) - 1
    emb = F.col(emb_col)
    scale = _scale_col(emb, qmax)
    q = F.transform(
        emb, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5))
    )
    qnorm_sq = F.aggregate(q, F.lit(0.0), lambda acc, v: acc + v * v)
    recon_err = F.aggregate(
        F.zip_with(emb, q, lambda x, v: F.abs(x.cast("double") - v * scale)),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    )
    return df.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        qnorm_sq.cast("bigint").alias("qnorm_sq"),
        F.round(recon_err, 6).alias("recon_err"),
    )
