"""Training-sequence packing: bin documents into fixed token budgets.

Trainers consume fixed-length sequences; feeding one short document per
sequence wastes the budget on padding, so corpus pipelines PACK several
documents into each sequence (with separator tokens) before export —
"sample packing" / "example packing" in pretraining data literature.

Optimal bin packing is NP-hard and inherently sequential, so the
distributed shape is the standard compromise: hash-bucket documents
into independent groups, then run greedy first-fit-decreasing INSIDE
each bucket with ``applyInPandas`` — buckets pack in parallel, each
bucket's packing is deterministic (sorted input, stable ids), and the
approximation loss vs global packing is bounded by bucket granularity.
No driver-side state; 100 TB packs as ordinary partition parallelism.

Bucket count: per-bucket FFD is a Python bins scan (worst-case
quadratic in bucket membership), so bucket size must stay bounded as
the corpus grows. With the default ``buckets=None`` the operator counts
the corpus once and sizes buckets to ~``target_bucket_docs`` documents
each — bucket work stays constant and scale-out is purely more buckets.
Pass an explicit ``buckets`` to skip the count when the caller already
knows the corpus size.

Determinism: bucket assignment is the portable md5 bucket
(llmops/sampling.hash_bucket), and within a bucket documents sort by
(token_count desc, id) before first-fit, so the packing is a pure
function of the data — stable across runs and partitionings.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from gfw_data_api_spark.llmops.sampling import hash_bucket
from gfw_data_api_spark.llmops.text import token_count

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _pack_schema(id_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("pack_bucket", T.IntegerType()),
            T.StructField("seq_id", T.LongType()),
            T.StructField("doc_ids", T.ArrayType(id_type)),
            T.StructField("n_docs", T.IntegerType()),
            T.StructField("n_tokens", T.LongType()),
            T.StructField("fill_ratio", T.DoubleType()),
        ]
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int | None = None,
    sep_tokens: int = 1,
    seed: int = 0,
    target_bucket_docs: int = 50_000,
) -> DataFrame:
    """Pack documents into sequences of ≤ ``max_tokens`` tokens.

    Returns one row per packed sequence: the member doc ids (in pack
    order, carrying the input id type — integral ids stay BIGINT,
    string/uuid ids stay STRING), member count, token total (including
    ``sep_tokens`` between members), and the fill ratio. Documents
    longer than ``max_tokens`` get a sequence of their own (the caller
    chunks them first if truncation is not acceptable — see
    text.chunk_documents). NULL doc ids raise: a null key would pack an
    unidentifiable member, which silently corrupts the export.

    ``seq_id`` is globally unique and deterministic:
    ``bucket * 2^40 + index-within-bucket``.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    id_type = df.schema[id_col].dataType
    if isinstance(id_type, _INTEGRAL):
        id_expr, out_id_type = F.col(id_col).cast("long"), T.LongType()
        coerce = int
    elif isinstance(id_type, T.StringType):
        id_expr, out_id_type = F.col(id_col), T.StringType()
        coerce = str
    else:
        raise ValueError(
            f"pack_sequences needs an integral or string id column; "
            f"{id_col!r} is {id_type.simpleString()}"
        )
    if buckets is None:
        n_docs = df.select(id_col).count()
        buckets = max(32, math.ceil(n_docs / target_bucket_docs))
    with_counts = df.select(
        id_expr.alias("_id"),
        token_count(F.col(text_col)).alias("_nt"),
        hash_bucket(F.col(id_col), seed=seed, buckets=buckets)
        .cast("int")
        .alias("pack_bucket"),
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if pdf["_id"].isna().any():
                raise ValueError(
                    f"pack_sequences: NULL values in id column {id_col!r}"
                )
            bucket = int(pdf["pack_bucket"].iloc[0])
            # first-fit-decreasing over a deterministic order
            pdf = pdf.sort_values(["_nt", "_id"], ascending=[False, True])
            bins: list[dict] = []
            for _id, nt in zip(pdf["_id"], pdf["_nt"]):
                nt = int(nt)
                placed = False
                for b in bins:
                    add = nt + (sep_tokens if b["ids"] else 0)
                    if b["tokens"] + add <= max_tokens:
                        b["tokens"] += add
                        b["ids"].append(coerce(_id))
                        placed = True
                        break
                if not placed:
                    bins.append({"tokens": nt, "ids": [coerce(_id)]})
            yield pd.DataFrame(
                {
                    "pack_bucket": bucket,
                    "seq_id": [bucket * (1 << 40) + i for i in range(len(bins))],
                    "doc_ids": [b["ids"] for b in bins],
                    "n_docs": [len(b["ids"]) for b in bins],
                    "n_tokens": [b["tokens"] for b in bins],
                    "fill_ratio": [
                        min(b["tokens"], max_tokens) / max_tokens for b in bins
                    ],
                }
            )

    return with_counts.groupBy("pack_bucket").applyInPandas(
        pack, schema=_pack_schema(out_id_type)
    )


def packing_efficiency(packed: DataFrame, max_tokens: int = 4096) -> DataFrame:
    """Corpus-level packing report: sequences, mean fill, waste share."""
    return packed.agg(
        F.count("*").alias("n_sequences"),
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        (F.sum("n_tokens") / (F.count("*") * F.lit(max_tokens)))
        .cast("double")
        .alias("mean_fill"),
    )
