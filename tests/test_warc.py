"""Tests for the WARC source (sources/warc.py) — gate entry e15."""

import gzip

import pytest
from pyspark.sql import functions as F

from gfw_data_api_spark.sources.warc import (
    build_warc_bytes,
    http_response_payload,
    iter_warc_records,
    read_warc,
    split_http_response,
    write_warc,
)


def _records():
    return [
        {
            "warc_type": "warcinfo",
            "payload": "software: test-crawler\r\n",
            "content_type": "application/warc-fields",
        },
        {
            "warc_type": "response",
            "target_uri": "http://example.com/a",
            "payload": http_response_payload("<p>page A</p>"),
            "content_type": "application/http; msgtype=response",
        },
        {
            "warc_type": "response",
            "target_uri": "http://example.com/b",
            "payload": http_response_payload("<p>page B</p>", status=404),
        },
        {
            "warc_type": "request",
            "target_uri": "http://example.com/a",
            "payload": b"GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n",
        },
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_iter(gz):
    data = build_warc_bytes(_records(), gzip_per_record=gz)
    if gz:
        assert data[:2] == b"\x1f\x8b"
    recs = list(iter_warc_records(data))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "response", "response", "request"]
    # content-length is exact: payload bytes survive byte-for-byte
    _, body = recs[1]
    assert body == http_response_payload("<p>page A</p>")


def test_split_http_response():
    status, ctype, body = split_http_response(http_response_payload("<i>x</i>"))
    assert (status, ctype, body) == (200, "text/html", b"<i>x</i>")
    # non-HTTP payload passes through untouched
    status, ctype, body = split_http_response(b"software: x\r\n")
    assert status is None and ctype is None and body == b"software: x\r\n"


def test_truncated_and_malformed_raise():
    data = build_warc_bytes(_records(), gzip_per_record=False)
    with pytest.raises(ValueError, match="truncated WARC record"):
        list(iter_warc_records(data[:-30]))
    with pytest.raises(ValueError, match="WARC/ magic"):
        list(iter_warc_records(b"NOT-A-WARC\r\n\r\n"))
    with pytest.raises(ValueError, match="Content-Length"):
        list(
            iter_warc_records(
                b"WARC/1.0\r\nWARC-Type: response\r\n\r\n"
            )
        )


def test_folded_header_lines_append_to_previous_value():
    block = (
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.com/very\r\n"
        b" /long/path\r\n"
        b"Content-Length: 0\r\n"
    )
    from gfw_data_api_spark.sources.warc import parse_warc_headers

    h = parse_warc_headers(block)
    assert h["warc-target-uri"] == "http://example.com/very /long/path"
    with pytest.raises(ValueError, match="continuation line"):
        parse_warc_headers(b" orphan continuation\r\n")


def test_lf_only_http_response_is_split():
    payload = b"HTTP/1.1 200 OK\nContent-Type: text/plain\n\nbody"
    status, ctype, body = split_http_response(payload)
    assert (status, ctype, body) == (200, "text/plain", b"body")


def test_empty_record_types_matches_nothing(spark, tmp_path):
    path = str(tmp_path / "f.warc.gz")
    write_warc(path, _records())
    assert read_warc(spark, path, record_types=()).count() == 0


def test_read_warc_dataframe(spark, tmp_path):
    p1 = str(tmp_path / "part1.warc.gz")
    p2 = str(tmp_path / "part2.warc")
    write_warc(p1, _records())
    write_warc(p2, _records(), gzip_per_record=False)
    df = read_warc(spark, str(tmp_path) + "/*")
    rows = df.collect()
    assert len(rows) == 8  # 4 records x 2 files
    responses = [r for r in rows if r.warc_type == "response"]
    assert {r.http_status for r in responses} == {200, 404}
    a = next(r for r in responses if r.target_uri == "http://example.com/a")
    assert bytes(a.payload) == b"<p>page A</p>"
    assert a.http_content_type == "text/html"
    assert a.record_id.startswith("<urn:uuid:")


def test_read_warc_record_type_filter(spark, tmp_path):
    path = str(tmp_path / "f.warc.gz")
    write_warc(path, _records())
    df = read_warc(spark, path, record_types=("response",))
    assert df.count() == 2
    assert set(df.select("warc_type").toPandas()["warc_type"]) == {"response"}


def test_read_warc_empty_match_yields_empty_typed_df(spark, tmp_path):
    path = str(tmp_path / "f.warc.gz")
    write_warc(path, _records())
    df = read_warc(spark, path, record_types=("conversion",))
    assert df.count() == 0
    assert df.schema["payload"].dataType.simpleString() == "binary"


def test_warc_to_text_pipeline(spark, tmp_path):
    """The crawl pipeline composition: WARC -> HTTP split -> HTML extract."""
    from gfw_data_api_spark.llmops.html import strip_html_col

    path = str(tmp_path / "f.warc.gz")
    write_warc(path, _records())
    df = (
        read_warc(spark, path, record_types=("response",))
        .filter(F.col("http_status") == 200)
        .select("target_uri", strip_html_col(F.col("payload").cast("string")).alias("text"))
    )
    rows = df.collect()
    assert len(rows) == 1
    assert rows[0].text == "page A"
