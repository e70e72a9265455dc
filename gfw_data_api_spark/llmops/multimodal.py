"""Multimodal columns: media as opaque binary + typed metadata.

Model: a media column is ``binary`` payload beside a
``struct<media_type, format, width, height, duration_ms, n_frames>``
metadata column. Decode / feature-extraction / resize / frame-sampling
run as Arrow-batched ``mapInPandas`` stages so a 100 TB media table
processes with ordinary partition parallelism and bounded memory
(``maxRecordsPerBatch`` caps batch bytes).

The image/audio codec libraries are NOT present in this environment, so
the codec call itself is stubbed: ``decode_media`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
hash-derived pseudo-decode stands in. The Spark-side plumbing — schemas,
batching, UDF signatures, partitioning — is real and tested; swapping the
stub for PIL/ffmpeg is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_DIM = 16


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """Decode a media payload to an array.

    STUB: real decoding needs PIL/libav, which this environment lacks.
    With ``fake=True`` a deterministic pseudo-decode (bytes → seeded
    array) exercises the full pipeline shape.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/ffmpeg) are not available in this environment; "
            "pass fake=True for the deterministic test decode"
        )
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(64, dtype=np.float64)


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
    fake: bool = True,
) -> DataFrame:
    """Feature extraction over media payloads via mapInPandas.

    Output schema = input + ``features array<float>`` + ``content_sha256``.
    Batches stream through Arrow; nothing is collected driver-side.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("content_sha256", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, hashes = [], []
            for payload, meta in zip(pdf[payload_col], pdf[meta_col]):
                if payload is None:
                    feats.append(None)
                    hashes.append(None)
                    continue
                data = bytes(payload)
                media_type = meta["media_type"] if meta is not None else "image"
                decoded = decode_media(data, media_type, fake=fake)
                # pooled pseudo-embedding: fixed-dim mean-pool of the decode
                pooled = decoded.reshape(FEATURE_DIM, -1).mean(axis=1).astype(np.float32)
                feats.append(pooled.tolist())
                hashes.append(hashlib.sha256(data).hexdigest())
            pdf = pdf.copy()
            pdf["features"] = feats
            pdf["content_sha256"] = hashes
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Resize stage (stub): passes payloads through and rewrites metadata
    dims — the real version swaps one line for a PIL resize. Metadata is
    updated natively (no UDF for the bookkeeping)."""
    meta = F.col(meta_col)
    new_meta = F.struct(
        meta["media_type"].alias("media_type"),
        meta["format"].alias("format"),
        F.lit(width).alias("width"),
        F.lit(height).alias("height"),
        meta["duration_ms"].alias("duration_ms"),
        meta["n_frames"].alias("n_frames"),
    )
    return df.withColumn(meta_col, new_meta)


def sample_frames(
    df: DataFrame,
    every_nth: int,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Frame-sampling plan for video rows: computes the sampled frame index
    list natively; the decode of those frames is the stubbed step."""
    n_frames = F.coalesce(F.col(meta_col)["n_frames"], F.lit(0))
    return df.withColumn(
        "sampled_frames",
        F.when(
            F.col(meta_col)["media_type"] == "video",
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_nth)),
        ).otherwise(F.array().cast("array<int>")),
    )


def media_dedup_keys(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Exact media dedup key: sha256 of payload bytes (native, no UDF)."""
    return df.withColumn("media_key", F.sha2(F.col(payload_col), 256))
