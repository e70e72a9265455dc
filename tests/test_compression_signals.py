"""Tests for the zlib compression-ratio quality signal (gate t23)."""

import zlib

from pyspark.sql import functions as F

from gfw_data_api_spark.llmops.text import compression_signals


def test_degenerate_vs_natural_separation(spark):
    rows = [
        (1, "a" * 200),
        (2, "the quick brown fox jumps over the lazy dog near the riverbank today"),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r for r in compression_signals(df).collect()}
    assert got[1].is_degenerate is True
    assert got[1].n_bytes == 200
    # exact n_compressed must equal this interpreter's zlib (same impl)
    assert got[1].n_compressed == len(zlib.compress(b"a" * 200, 6))
    assert got[2].is_degenerate is False
    assert got[2].compress_ratio > 0.33
    # NULL and empty text -> NULL signals
    assert got[3].n_compressed is None and got[3].is_degenerate is None
    assert got[4].compress_ratio is None and got[4].is_degenerate is None


def test_multibyte_text_uses_octet_length(spark):
    df = spark.createDataFrame([(1, "привет" * 30)], "doc_id bigint, text string")
    r = compression_signals(df).collect()[0]
    assert r.n_bytes == len(("привет" * 30).encode("utf-8"))
    assert r.is_degenerate is True  # repeated multibyte compresses away


def test_threshold_parameter(spark):
    df = spark.createDataFrame([(1, "a" * 100)], "doc_id bigint, text string")
    strict = compression_signals(df, degenerate_below=0.01).collect()[0]
    assert strict.is_degenerate is False
