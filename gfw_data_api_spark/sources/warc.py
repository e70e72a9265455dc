"""WARC (Web ARChive, ISO 28500) ingestion: the Common Crawl container.

Web-scale corpora start life as WARC: a sequence of records, each a
``WARC/1.x`` header block (CRLF-separated ``Name: value`` lines, ended by
a blank line) followed by exactly ``Content-Length`` bytes of content and
a ``\\r\\n\\r\\n`` separator. Crawl dumps ship as ``.warc.gz`` with ONE
GZIP MEMBER PER RECORD, concatenated — the public trick that makes a
compressed archive seekable at record boundaries.

This module parses the format in pure Python (executor-side, Arrow
batches) and exposes it as a DataFrame source feeding the rest of the
pipeline (``llmops/html.strip_html_col`` for extraction, then dedup /
quality / lang-id):

- ``read_warc(spark, path)`` — ``binaryFile`` scan → ``mapInPandas``
  parse. For ``response`` records the embedded HTTP message is split
  into status / headers / body, so the payload column is the actual
  page bytes.
- ``build_warc_bytes`` / ``write_warc`` — a writer for fixtures, tests,
  and re-sharding; emits per-record gzip members like the real dumps.

Scale shape: one WARC file = one task (``binaryFile`` does not split,
and a 100 TB crawl is ~100k files × ~1 GB — file-level parallelism is
the standard unit; Common Crawl's own processing examples shard by
file). Within a task the parse is a single linear pass; per-record gzip
members decompress incrementally, so peak memory is one file plus one
record. Sub-file splitting via a record-offset index (the cdx sidecar
approach) is the documented next step if single files grow beyond task
granularity. Malformed records raise loudly (truncated content, missing
Content-Length, non-WARC magic) — a crawl pipeline must count corrupt
archives, not silently skip bytes.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("src_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream."""
    out = io.BytesIO()
    with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
        # GzipFile iterates members transparently on read()
        while True:
            chunk = fh.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)
    return out.getvalue()


def parse_warc_headers(block: bytes) -> dict[str, str]:
    """Parse a CRLF header block into a lower-cased dict (latin-1: WARC
    headers are octets; URI values are already percent-encoded).

    Folded continuation lines (leading SP/HT — legal per ISO 28500's
    RFC-2616-style grammar) append to the previous header's value with a
    single joining space.
    """
    headers: dict[str, str] = {}
    last: str | None = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t"):
            if last is None:
                raise ValueError(f"WARC continuation line without a header: {line[:60]!r}")
            cont = line.decode("latin-1").strip()
            headers[last] = f"{headers[last]} {cont}" if headers[last] else cont
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed WARC header line: {line[:60]!r}")
        last = name.decode("latin-1").strip().lower()
        headers[last] = value.decode("latin-1").strip()
    return headers


def iter_warc_records(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield ``(headers, content)`` per record from raw WARC bytes.

    Accepts gzipped input (magic-sniffed; multi-member streams are the
    per-record-member layout of real dumps).
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError(f"expected WARC/ magic at offset {pos}, got {data[pos:pos+16]!r}")
        version_end = data.find(b"\r\n", pos)
        header_end = data.find(b"\r\n\r\n", pos)
        if version_end < 0 or header_end < 0:
            raise ValueError(f"truncated WARC header block at offset {pos}")
        headers = parse_warc_headers(data[version_end + 2 : header_end])
        if "content-length" not in headers:
            raise ValueError(f"WARC record at offset {pos} missing Content-Length")
        clen = int(headers["content-length"])
        body_start = header_end + 4
        if body_start + clen > n:
            raise ValueError(
                f"truncated WARC record at offset {pos}: "
                f"declared {clen} bytes, {n - body_start} remain"
            )
        yield headers, data[body_start : body_start + clen]
        pos = body_start + clen


def split_http_response(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an embedded HTTP response into (status, content-type, body).

    Returns ``(None, None, payload)`` when the payload is not an HTTP
    message (e.g. warcinfo/metadata records).
    """
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    # real crawls contain LF-only responses from non-conforming servers;
    # take whichever blank-line separator appears FIRST
    sep_crlf = payload.find(b"\r\n\r\n")
    sep_lf = payload.find(b"\n\n")
    candidates = [
        (pos, width)
        for pos, width in ((sep_crlf, 4), (sep_lf, 2))
        if pos >= 0
    ]
    if not candidates:
        return None, None, payload
    sep, width = min(candidates)
    head = payload[:sep].replace(b"\r\n", b"\n").split(b"\n")
    try:
        status = int(head[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in head[1:]:
        name, s, value = line.partition(b":")
        if s and name.decode("latin-1").strip().lower() == "content-type":
            ctype = value.decode("latin-1").strip()
            break
    return status, ctype, payload[sep + width :]


def read_warc(
    spark: SparkSession, path: str, *, record_types: tuple[str, ...] | None = None
) -> DataFrame:
    """Scan WARC/WARC.GZ files into a typed DataFrame (``WARC_SCHEMA``).

    ``record_types`` filters on WARC-Type (e.g. ``("response",)``) during
    the parse — cheaper than a post-hoc filter since skipped records'
    payloads never cross into Arrow.
    """
    # None = no filter; an explicit empty tuple means "match nothing"
    wanted = None if record_types is None else tuple(t.lower() for t in record_types)
    files = spark.read.format("binaryFile").load(path)

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for headers, body in iter_warc_records(bytes(content)):
                    wtype = headers.get("warc-type", "")
                    if wanted is not None and wtype.lower() not in wanted:
                        continue
                    status, http_ctype, payload = split_http_response(body)
                    rows.append(
                        {
                            "src_file": fpath,
                            "record_id": headers.get("warc-record-id"),
                            "warc_type": wtype,
                            "target_uri": headers.get("warc-target-uri"),
                            "warc_date": headers.get("warc-date"),
                            "content_type": headers.get("content-type"),
                            "content_length": int(headers["content-length"]),
                            "http_status": status,
                            "http_content_type": http_ctype,
                            "payload": payload,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            ) if rows else pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in WARC_SCHEMA.fields}
            )

    return files.select("path", "content").mapInPandas(_parse, WARC_SCHEMA)


def build_warc_bytes(
    records: Iterable[dict], *, gzip_per_record: bool = True
) -> bytes:
    """Serialize records to WARC bytes (per-record gzip members like the
    real dumps unless ``gzip_per_record=False``).

    Each record dict: ``warc_type`` (required), ``payload`` (bytes),
    optional ``target_uri``, ``record_id``, ``warc_date``,
    ``content_type``.
    """
    out = io.BytesIO()
    for i, rec in enumerate(records):
        payload = rec.get("payload", b"")
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        headers = [
            ("WARC-Type", rec["warc_type"]),
            ("WARC-Record-ID", rec.get("record_id", f"<urn:uuid:rec-{i:08d}>")),
            ("WARC-Date", rec.get("warc_date", "2024-01-01T00:00:00Z")),
        ]
        if rec.get("target_uri"):
            headers.append(("WARC-Target-URI", rec["target_uri"]))
        if rec.get("content_type"):
            headers.append(("Content-Type", rec["content_type"]))
        headers.append(("Content-Length", str(len(payload))))
        blob = (
            b"WARC/1.0\r\n"
            + b"".join(f"{k}: {v}\r\n".encode("latin-1") for k, v in headers)
            + b"\r\n"
            + payload
            + b"\r\n\r\n"
        )
        if gzip_per_record:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(blob)
            out.write(buf.getvalue())
        else:
            out.write(blob)
    return out.getvalue()


def http_response_payload(
    body: bytes | str, *, status: int = 200, content_type: str = "text/html"
) -> bytes:
    """Wrap page bytes in a minimal HTTP/1.1 response message (what a
    crawl's response records carry)."""
    if isinstance(body, str):
        body = body.encode("utf-8")
    reason = {200: "OK", 404: "Not Found", 301: "Moved Permanently"}.get(status, "")
    head = (
        f"HTTP/1.1 {status} {reason}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    )
    return head.encode("latin-1") + body


def write_warc(path: str, records: Iterable[dict], *, gzip_per_record: bool = True) -> None:
    with open(path, "wb") as fh:
        fh.write(build_warc_bytes(records, gzip_per_record=gzip_per_record))
