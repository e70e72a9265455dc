"""NDJSON / JSON-Lines ingestion: the LLM-corpus interchange format.

Web-scale training corpora (Common Crawl derivatives, The Pile, RedPajama,
Dolma) ship as JSON-Lines — one JSON object per line, usually with nested
metadata objects. This module makes JSONL a first-class source next to the
CSV/TSV path (``sources/tabular.py`` ``read_tabular_source``; reference
analog: the tabular loader ``batch/scripts/load_tabular_data.sh`` +
``create_tabular_schema.sh``, which the reference limits to delimited text —
JSONL is an engine extension for the LLM-pipeline family).

Semantics mirrored from the CSV path:

- **schema inference or declared schema** — inference samples the data
  (one extra pass); production pipelines should pass ``schema`` so ingest
  is single-pass and drift becomes an explicit error instead of a silent
  schema change.
- **malformed-record policy** — ``mode="PERMISSIVE"`` (default) lands bad
  lines in ``_corrupt_record`` so the pipeline can count/quarantine them;
  ``DROPMALFORMED`` silently drops; ``FAILFAST`` aborts the scan. The
  permissive default matches corpus reality: a 100 TB crawl dump always
  has some truncated lines, and dropping them silently hides upstream
  breakage.
- **nested flattening** — ``flatten=True`` recursively promotes struct
  fields to top-level ``parent<sep>child`` columns (arrays stay intact),
  the usual normalization step before landing to partitioned parquet.

Scale shape: JSON-Lines is line-delimited, so uncompressed (or
bzip2/zstd-seekable) files SPLIT — Spark assigns byte ranges per task and
scans in parallel; schema-declared reads are one pass with column pruning
pushed into the parser (Jackson only materializes requested fields).
Gzip-compressed JSONL does NOT split (one task per file) — repartition
immediately after read or, better, land gzip corpora to parquet once and
query the parquet. Flattening is a pure projection (no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MODES = ("PERMISSIVE", "DROPMALFORMED", "FAILFAST")


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """Recursively promote struct fields to top-level columns.

    ``meta: struct<lang, source>`` becomes ``meta_lang, meta_source``.
    Arrays (and arrays of structs) are left as-is — exploding is a row
    multiplier the caller must opt into. Raises on a name collision
    instead of silently shadowing a column.
    """
    while True:
        struct_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_cols:
            return df
        flat_names = [f.name for f in df.schema.fields if f.name not in struct_cols]
        cols = [F.col(n) for n in flat_names]
        seen = set(flat_names)
        for parent in struct_cols:
            for field in df.schema[parent].dataType.fields:
                name = f"{parent}{sep}{field.name}"
                if name in seen:
                    raise ValueError(
                        f"flatten_structs: column {name!r} already exists; "
                        f"pick a different sep than {sep!r}"
                    )
                seen.add(name)
                cols.append(F.col(parent).getField(field.name).alias(name))
        df = df.select(*cols)


def _configure_json_reader(reader, schema, mode, corrupt_col, multiline):
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")
    reader = reader.option("mode", mode)
    if mode == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        if isinstance(schema, str):
            schema = T.StructType.fromDDL(schema)
        if mode == "PERMISSIVE" and corrupt_col not in schema.fieldNames():
            # copy first: StructType.add() mutates in place and the
            # caller's schema object must not grow a phantom column
            schema = T.StructType(list(schema.fields)).add(corrupt_col, T.StringType(), True)
        reader = reader.schema(schema)
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | str | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    multiline: bool = False,
    flatten: bool = False,
    sep: str = "_",
) -> DataFrame:
    """Read NDJSON/JSON-Lines (or whole-file JSON with ``multiline=True``).

    With ``mode="PERMISSIVE"`` and an explicit ``schema``, the schema must
    already contain ``corrupt_col`` (string) for bad lines to be captured —
    this function appends it automatically. Under inference, Spark adds the
    column only when corrupt rows exist in the sample; callers should treat
    its absence as "no corrupt rows seen".
    """
    reader = _configure_json_reader(spark.read, schema, mode, corrupt_col, multiline)
    df = reader.json(path)
    if flatten:
        df = flatten_structs(df, sep=sep)
    return df


def stream_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema: T.StructType | str,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    flatten: bool = False,
    sep: str = "_",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming twin of :func:`read_jsonl` for a landing
    directory of JSONL files (the continuous-ingest shape: crawlers land
    shards, the stream picks them up per micro-batch).

    A declared ``schema`` is REQUIRED — streaming sources cannot infer —
    and the PERMISSIVE corrupt-capture semantics are identical to the
    batch reader, so one aggregation (e.g. a per-source quality monitor)
    runs unchanged on either. ``max_files_per_trigger`` caps micro-batch
    size for backpressure.
    """
    if schema is None:  # defensive: callers passing None explicitly
        raise ValueError("stream_jsonl requires a declared schema")
    reader = _configure_json_reader(
        spark.readStream, schema, mode, corrupt_col, multiline=False
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    df = reader.json(path)
    if flatten:
        df = flatten_structs(df, sep=sep)
    return df


def ingest_monitor_by_source(
    df: DataFrame,
    source_col: str = "source",
    chars_col: str = "n_chars",
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Per-source ingest quality counts — the aggregation a landing
    monitor runs on every micro-batch (outputMode=complete) and that the
    batch twin runs for the oracle: corrupt rows fold into a reserved
    ``__corrupt__`` source. One grouped aggregate, map-side combined;
    referencing the data columns keeps the plan legal on raw JSON scans
    (see :func:`corrupt_record_summary`)."""
    # under schema inference Spark adds the corrupt column only when the
    # sample contained corrupt rows — treat its absence as all-valid
    # (the same guard corrupt_record_summary applies)
    bad = (
        F.col(corrupt_col).isNotNull() if corrupt_col in df.columns else F.lit(False)
    )
    return df.groupBy(
        F.when(bad, F.lit("__corrupt__")).otherwise(F.col(source_col)).alias("source")
    ).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.when(~bad, F.col(chars_col))), F.lit(0)).alias("sum_chars"),
    )


def corrupt_record_summary(
    df: DataFrame, corrupt_col: str = "_corrupt_record", sample: int = 5
) -> DataFrame:
    """One-row quarantine report: valid/corrupt counts, a deterministic
    sample of offending lines (ordered, truncated), and per-data-column
    null counts over the valid rows.

    The null counts are an ingest-quality signal in their own right, and
    they keep the plan legal on a raw JSON scan: Spark disallows queries
    whose pruned schema is ONLY ``_corrupt_record``
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the parser
    only populates the corrupt column while parsing data columns, so a
    corrupt-only projection would return wrong answers). Referencing
    every data column in the output makes pruning retain them.
    """
    data_cols = [c for c in df.columns if c != corrupt_col]
    null_aggs = [
        F.count(F.when(F.col(c).isNull(), True)).alias(f"n_null_{c}") for c in data_cols
    ]
    if corrupt_col not in df.columns:
        return df.agg(
            F.count("*").alias("n_valid"),
            F.lit(0).cast("bigint").alias("n_corrupt"),
            F.array().cast("array<string>").alias("corrupt_sample"),
            *null_aggs,
        )
    bad = F.col(corrupt_col).isNotNull()
    null_aggs = [
        F.count(F.when(~bad & F.col(c).isNull(), True)).alias(f"n_null_{c}")
        for c in data_cols
    ]
    return df.agg(
        F.count(F.when(~bad, True)).alias("n_valid"),
        F.count(F.when(bad, True)).alias("n_corrupt"),
        F.slice(
            F.sort_array(F.collect_set(F.when(bad, F.substring(F.col(corrupt_col), 1, 80)))),
            1,
            sample,
        ).alias("corrupt_sample"),
        *null_aggs,
    )
