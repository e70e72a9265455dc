"""Training-shard export: WebDataset-style tar shards.

The dominant loader convention for large-scale training (WebDataset /
torchdata): a dataset is a directory of ``.tar`` shards, each sample a
run of files sharing a basename key (``{key}.txt``, ``{key}.json``,
``{key}.bin`` …), streamed sequentially by the data loader with no
random access. This module writes and reads that layout from Spark:

- :func:`write_webdataset` — deterministic sharding (the portable md5
  bucket of the id, so membership is stable across partitionings and
  reruns), samples sorted by id within each shard, tar members emitted
  with zeroed mtime/uid/gid so SHARD BYTES are reproducible
  bit-for-bit. Each shard is built and written by one task
  (``applyInPandas`` per bucket — shard size is the parallelism unit,
  exactly like the real corpora: ~1k-10k samples per tar); the
  returned manifest (shard id, sample count, byte size, md5) is the
  audit record.
- :func:`read_webdataset` — ``binaryFile`` scan → ``tarfile`` parse in
  Arrow batches, one row per member, grouped back into samples by key
  downstream. One tar = one task, the format's own parallelism grain.

Scale shape: one hash shuffle on the shard bucket for the write (the
same cost class as any partitioned write), sequential tar assembly per
shard in a single pass, no driver involvement beyond the manifest.

Deployment boundary (loud, not silent): shards are written with plain
``open()`` from EXECUTOR tasks, so ``path`` must be a filesystem every
executor can reach — local mode or a shared POSIX mount (NFS/Lustre,
the usual training-cluster layout). Object stores (s3://, hdfs://) need
a committer-based writer and are not supported here; NULL text raises
rather than silently exporting empty members.
"""

from __future__ import annotations

import hashlib
import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("tar_md5", T.StringType()),
    ]
)

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_file", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("ext", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _tar_add(tar: tarfile.TarFile, name: str, payload: bytes) -> None:
    info = tarfile.TarInfo(name=name)
    info.size = len(payload)
    info.mtime = 0
    info.uid = info.gid = 0
    info.uname = info.gname = ""
    tar.addfile(info, io.BytesIO(payload))


def write_webdataset(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: list[str] | None = None,
    n_shards: int = 8,
    seed: int = 0,
) -> DataFrame:
    """Write ``{path}/shard-NNNNN.tar`` files and return the manifest.

    Each sample becomes ``{id}.txt`` (UTF-8 text) and, when
    ``meta_cols`` is given, ``{id}.json`` (sorted-key JSON of those
    columns). Shard membership is the portable md5 bucket of the id;
    samples are id-sorted within a shard and tar metadata is zeroed, so
    every shard's bytes are a pure function of (data, n_shards, seed).
    """
    import numpy as np

    from gfw_data_api_spark.llmops.sampling import hash_bucket
    from pyspark.sql import types as _T

    meta_cols = list(meta_cols or [])
    cols = [id_col, text_col, *meta_cols]
    selected = df.select(*cols)
    # Arrow→pandas turns nullable integer columns into float64; remember
    # which meta columns are integral so JSON emits 21, not 21.0/NaN
    int_cols = {
        f.name
        for f in selected.schema.fields
        if f.name in meta_cols and isinstance(f.dataType, _T.IntegralType)
    }
    bucketed = selected.withColumn(
        "_shard", hash_bucket(F.col(id_col).cast("string"), seed=seed, buckets=n_shards)
    )

    def _clean_meta(col: str, v):
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            return None
        if col in int_cols:
            return int(v)
        if isinstance(v, np.integer):
            return int(v)
        if isinstance(v, np.floating):
            return float(v)
        return v

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=[f.name for f in MANIFEST_SCHEMA.fields])
        # executors write the shards, so the target dir must exist HERE
        # (driver-side makedirs only helps local mode); plain open()
        # requires `path` to be a shared POSIX mount — the documented
        # deployment boundary (object stores need a committer, not this)
        os.makedirs(path, exist_ok=True)
        if pdf[text_col].isna().any():
            bad = pdf.loc[pdf[text_col].isna(), id_col].iloc[0]
            raise ValueError(
                f"NULL {text_col} for id {bad!r}: a WebDataset sample cannot "
                "roundtrip a null text member — filter or fill upstream"
            )
        shard = int(pdf["_shard"].iloc[0])
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].tolist()
        # member keys must stay unique and flat: duplicate ids collide
        # on the tar member name and '/' in an id nests paths inside
        # the tar — both silently break WebDataset's key-based sample
        # grouping, so fail loudly (same policy as NULL text above)
        keys = [str(i) for i in ids]
        seen: set = set()
        for k in keys:
            if "/" in k:
                raise ValueError(
                    f"id {k!r} contains '/': tar member names must be flat "
                    "— sanitize ids upstream"
                )
            if k in seen:
                raise ValueError(
                    f"duplicate id {k!r} in shard {shard}: member keys "
                    "must be unique — dedupe ids upstream"
                )
            seen.add(k)
        texts = pdf[text_col].tolist()
        metas = {c: pdf[c].tolist() for c in meta_cols}
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            for j, key in enumerate(keys):
                _tar_add(tar, f"{key}.txt", str(texts[j]).encode("utf-8"))
                if meta_cols:
                    meta = {c: _clean_meta(c, metas[c][j]) for c in meta_cols}
                    _tar_add(
                        tar,
                        f"{key}.json",
                        json.dumps(
                            meta, sort_keys=True, allow_nan=False, default=str
                        ).encode("utf-8"),
                    )
        blob = buf.getvalue()
        out = os.path.join(path, f"shard-{shard:05d}.tar")
        with open(out, "wb") as fh:
            fh.write(blob)
        return pd.DataFrame(
            [
                {
                    "shard_id": shard,
                    "n_samples": len(pdf),
                    "n_bytes": len(blob),
                    "tar_md5": hashlib.md5(blob).hexdigest(),
                }
            ]
        )

    return bucketed.groupBy("_shard").applyInPandas(_build, MANIFEST_SCHEMA)


def read_webdataset(spark: SparkSession, path: str) -> DataFrame:
    """Scan WebDataset tar shards into one row per member
    (``shard_file, key, ext, payload``); group by ``key`` to reassemble
    samples."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.tar") if not path.endswith(".tar") else path
    )

    def _parse(batches):
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                with tarfile.open(fileobj=io.BytesIO(bytes(content))) as tar:
                    for member in tar.getmembers():
                        if not member.isfile():
                            continue
                        base = os.path.basename(member.name)
                        key, _, ext = base.rpartition(".")
                        payload = tar.extractfile(member).read()
                        rows.append(
                            {
                                "shard_file": fpath,
                                "key": key,
                                "ext": ext,
                                "payload": payload,
                            }
                        )
            yield (
                pd.DataFrame(rows, columns=[f.name for f in MEMBER_SCHEMA.fields])
                if rows
                else pd.DataFrame({f.name: pd.Series(dtype="object") for f in MEMBER_SCHEMA.fields})
            )

    return files.select("path", "content").mapInPandas(_parse, MEMBER_SCHEMA)


def assign_byte_shards(
    df: DataFrame,
    target_bytes: int,
    id_col: str = "doc_id",
    size_col: str | None = None,
    bucket_width: int = 100_000,
    out_col: str = "shard_id",
) -> DataFrame:
    """Deterministic byte-budget shard assignment: documents ordered by
    ``id_col`` are binned so each shard holds ~``target_bytes`` —
    ``shard_id = exclusive_prefix_sum(size) // target_bytes`` (the
    prefix-bin rule: a document starts the shard its preceding bytes
    land in; identical arithmetic is replayable in any engine).

    Scale shape (the reason this exists as an operator): a global
    running sum is an UNPARTITIONED window — one task at 100 TB.
    Instead the prefix sum is two-level, the classic distributed scan:

    1. per-bucket partial sums (``bucket = id // bucket_width``) — one
       map-combined aggregation;
    2. bucket offsets by a driver-side prefix over the SMALL bucket
       table (guarded: ≤ 10M buckets collect, ~160 MB worst case);
    3. within-bucket cumulative sums under a window PARTITIONED BY
       bucket, plus the broadcast offset.

    ``size_col`` defaults to ``octet_length(text)`` — exact integer
    bytes, so shard ids match bit-for-bit across engines."""
    from pyspark.sql import Window

    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    size = F.col(size_col) if size_col else F.octet_length("text")
    sized = df.withColumn("_bytes", size.cast("long")).withColumn(
        "_bucket", (F.col(id_col) / F.lit(bucket_width)).cast("long")
    )
    partials = (
        sized.groupBy("_bucket")
        .agg(F.sum("_bytes").alias("_bsum"))
        .limit(10_000_001)  # cap BEFORE collecting (same pattern as
        .collect()          # operators.downloads._guard_collect)
    )
    if len(partials) > 10_000_000:  # pragma: no cover - guard only
        raise ValueError(
            "assign_byte_shards: too many id buckets for the driver "
            "prefix; raise bucket_width"
        )
    offsets = {}
    running = 0
    for row in sorted(partials, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = running
        running += row["_bsum"]
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(b), int(o)) for b, o in offsets.items()],
            "_bucket long, _offset long",
        )
    )
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        sized.join(off_df, "_bucket")
        .withColumn("_cum", F.sum("_bytes").over(w) + F.col("_offset"))
        .withColumn(
            out_col,
            ((F.col("_cum") - F.col("_bytes")) / F.lit(target_bytes)).cast("long"),
        )
        .drop("_bytes", "_bucket", "_offset", "_cum")
    )
