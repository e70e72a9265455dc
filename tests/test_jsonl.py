"""Tests for the JSON-Lines source (sources/jsonl.py) — gate entry e14."""

import json
import os

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.sources.jsonl import (
    corrupt_record_summary,
    flatten_structs,
    read_jsonl,
)


@pytest.fixture()
def jsonl_file(tmp_path):
    rows = [
        {"doc_id": 1, "meta": {"lang": "en", "source": "web"}, "n_chars": 10},
        {"doc_id": 2, "meta": {"lang": "de", "source": "web"}, "n_chars": 20},
        {"doc_id": 3, "meta": {"lang": "en", "source": "book"}, "n_chars": 30},
    ]
    path = tmp_path / "docs.jsonl"
    with open(path, "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")
        fh.write('{"doc_id": 4, "meta": {broken\n')
        fh.write("not json at all\n")
    return str(path)


SCHEMA = "doc_id bigint, meta struct<lang:string, source:string>, n_chars bigint"


def test_permissive_captures_corrupt_and_flattens(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, schema=SCHEMA, flatten=True)
    assert "meta_lang" in df.columns and "meta_source" in df.columns
    assert "meta" not in df.columns
    rows = df.collect()
    bad = [r for r in rows if r._corrupt_record is not None]
    good = [r for r in rows if r._corrupt_record is None]
    assert len(bad) == 2
    assert len(good) == 3
    got = {r.doc_id: (r.meta_lang, r.meta_source, r.n_chars) for r in good}
    assert got == {1: ("en", "web", 10), 2: ("de", "web", 20), 3: ("en", "book", 30)}


def test_dropmalformed_and_failfast(spark, jsonl_file):
    dropped = read_jsonl(spark, jsonl_file, schema=SCHEMA, mode="DROPMALFORMED")
    assert dropped.count() == 3
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_jsonl(spark, jsonl_file, schema=SCHEMA, mode="FAILFAST").count()
    with pytest.raises(ValueError, match="mode"):
        read_jsonl(spark, jsonl_file, mode="LENIENT")


def test_inference_without_schema(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, flatten=True)
    good = df.filter(F.col("doc_id").isNotNull())
    assert good.count() == 3
    assert {r.meta_lang for r in good.collect()} == {"en", "de"}


def test_flatten_structs_nested_two_levels(spark):
    df = spark.createDataFrame(
        [(1, {"a": {"x": 5}, "b": "z"})],
        "id bigint, outer struct<a:struct<x:bigint>, b:string>",
    )
    flat = flatten_structs(df)
    assert set(flat.columns) == {"id", "outer_a_x", "outer_b"}
    row = flat.collect()[0]
    assert (row.outer_a_x, row.outer_b) == (5, "z")


def test_flatten_structs_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, 2, {"x": 3})], "id bigint, s_x bigint, s struct<x:bigint>"
    )
    with pytest.raises(ValueError, match="s_x"):
        flatten_structs(df)


def test_flatten_keeps_arrays_intact(spark):
    df = spark.createDataFrame(
        [({"tags": ["a", "b"]},)], "m struct<tags:array<string>>"
    )
    flat = flatten_structs(df)
    assert flat.schema["m_tags"].dataType.simpleString() == "array<string>"
    assert flat.collect()[0].m_tags == ["a", "b"]


def test_corrupt_record_summary(spark, jsonl_file):
    df = read_jsonl(spark, jsonl_file, schema=SCHEMA)
    row = corrupt_record_summary(df).collect()[0]
    assert (row.n_valid, row.n_corrupt) == (3, 2)
    assert len(row.corrupt_sample) == 2
    assert "not json at all" in row.corrupt_sample
    # per-data-column null counts over valid rows (all populated here)
    assert (row.n_null_doc_id, row.n_null_meta, row.n_null_n_chars) == (0, 0, 0)
    # absent corrupt column (e.g. after a projection) -> all-valid report
    clean = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    row2 = corrupt_record_summary(clean).collect()[0]
    assert (row2.n_valid, row2.n_corrupt, row2.corrupt_sample) == (3, 0, [])


def test_corrupt_summary_counts_nulls_in_valid_rows(spark, tmp_path):
    path = tmp_path / "nulls.jsonl"
    with open(path, "w") as fh:
        fh.write('{"doc_id": 1, "n_chars": null}\n')
        fh.write('{"doc_id": null, "n_chars": 5}\n')
        fh.write("garbage\n")
    df = read_jsonl(spark, str(path), schema="doc_id bigint, n_chars bigint")
    row = corrupt_record_summary(df).collect()[0]
    assert (row.n_valid, row.n_corrupt) == (2, 1)
    assert (row.n_null_doc_id, row.n_null_n_chars) == (1, 1)


def test_read_jsonl_does_not_mutate_caller_schema(spark, jsonl_file):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("doc_id", T.LongType())])
    read_jsonl(spark, jsonl_file, schema=schema)
    assert schema.fieldNames() == ["doc_id"]


def test_stream_jsonl_equals_batch_twin(spark, tmp_path):
    """Real readStream over a landing dir == the batch aggregation (st09)."""
    import json as _json

    from gfw_data_api_spark.sources.jsonl import ingest_monitor_by_source, stream_jsonl

    land = tmp_path / "land"
    land.mkdir()
    rows = [
        {"doc_id": 1, "source": "web", "n_chars": 10},
        {"doc_id": 2, "source": "web", "n_chars": 20},
        {"doc_id": 3, "source": "book", "n_chars": 5},
    ]
    # two shards so the stream sees >1 file; one corrupt line in shard 2
    with open(land / "s1.jsonl", "w") as fh:
        fh.write(_json.dumps(rows[0]) + "\n" + _json.dumps(rows[1]) + "\n")
    with open(land / "s2.jsonl", "w") as fh:
        fh.write(_json.dumps(rows[2]) + "\n" + "garbage{\n")

    schema = "doc_id bigint, source string, n_chars bigint"
    stream = stream_jsonl(spark, str(land), schema=schema, max_files_per_trigger=1)
    assert stream.isStreaming
    q = (
        ingest_monitor_by_source(stream)
        .writeStream.format("memory")
        .queryName("st09_monitor")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.source: (r.n_docs, r.sum_chars)
        for r in spark.sql("select * from st09_monitor").collect()
    }
    batch = read_jsonl(spark, str(land) + "/*.jsonl", schema=schema)
    want = {
        r.source: (r.n_docs, r.sum_chars)
        for r in ingest_monitor_by_source(batch).collect()
    }
    assert got == want
    assert got["__corrupt__"] == (1, 0)
    assert got["web"] == (2, 30)


def test_ingest_monitor_without_corrupt_column(spark, tmp_path):
    # inferred schema over a clean file: Spark omits _corrupt_record
    # entirely — the monitor must treat that as all-valid, not crash
    import json as _json

    from gfw_data_api_spark.sources.jsonl import ingest_monitor_by_source

    path = tmp_path / "clean.jsonl"
    with open(path, "w") as fh:
        fh.write(_json.dumps({"doc_id": 1, "source": "web", "n_chars": 4}) + "\n")
    df = read_jsonl(spark, str(path))
    assert "_corrupt_record" not in df.columns
    row = ingest_monitor_by_source(df).collect()[0]
    assert (row.source, row.n_docs, row.sum_chars) == ("web", 1, 4)


def test_stream_jsonl_requires_schema(spark):
    from gfw_data_api_spark.sources.jsonl import stream_jsonl

    with pytest.raises(ValueError, match="schema"):
        stream_jsonl(spark, "/nonexistent", schema=None)


def test_gzip_jsonl_reads_but_is_single_split(spark, tmp_path):
    import gzip

    path = tmp_path / "docs.jsonl.gz"
    with gzip.open(path, "wt") as fh:
        for i in range(5):
            fh.write(json.dumps({"doc_id": i, "n_chars": i * 2}) + "\n")
    df = read_jsonl(spark, str(path), schema="doc_id bigint, n_chars bigint")
    assert df.count() == 5
    # gzip is unsplittable: the scan must land in exactly one partition
    assert df.rdd.getNumPartitions() == 1
