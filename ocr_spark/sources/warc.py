"""WARC source: read Common-Crawl-style WARC files into the engine's
pages schema (url, warc_ts, html, ...).

Common Crawl publishes crawls as WARC/1.0 files (ISO 28500): a
concatenation of records, each ``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n
<block>\\r\\n\\r\\n``, where response records carry an HTTP response
(status line + headers + body) as the block and the capture metadata
(WARC-Target-URI, WARC-Date) as record headers.  Crawl files are
usually *per-record gzip members* concatenated into one ``.warc.gz``
— zlib inflates member-by-member.

Spark shape: ``spark.read.format("binaryFile")`` gives (path, content)
rows — one WARC file per row — and an Arrow ``mapInPandas`` kernel
splits records and emits pages.  WARC files don't have internal split
points without an index (Common Crawl ships ``.warc.gz`` member
offsets in the columnar index for that), so the parallel unit is the
FILE, exactly how a real crawl run fans out: 10^5 warc files x ~1 GB
each saturate any cluster without intra-file splitting.  For the
sandbox there is no 1 GB fixture; the synthesizer writes small files
and the driver query builds WARC bytes per document in-flight (same
pattern as the PDF path).

Malformed records become error ROWS (status='processing_error'),
never exceptions — a crawl file with one truncated record must not
kill a 10^5-file job.
"""

from __future__ import annotations

import io
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["WARC_PAGE_SCHEMA", "build_warc", "parse_warc_bytes",
           "read_warc", "warc_pages_from_binary"]

WARC_PAGE_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.StringType(), True),   # ISO-8601 from WARC-Date
    T.StructField("html", T.BinaryType(), True),
    T.StructField("record_type", T.StringType(), True),
    T.StructField("status", T.StringType(), True),
    T.StructField("error_msg", T.StringType(), True),
    T.StructField("source_file", T.StringType(), True),
])


def _gunzip_members(data: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the .warc.gz layout)."""
    out = io.BytesIO()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(31)  # 31 = gzip wrapper
        out.write(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return out.getvalue()


def parse_warc_bytes(data: bytes, source_file: str = "",
                     accept: tuple = ("response",)) -> list[dict]:
    """Parse one WARC file's bytes into page dicts (WARC_PAGE_SCHEMA
    fields).  Response records yield the HTTP body as ``html``;
    records whose WARC-Type is not in ``accept`` (warcinfo, request,
    metadata) are skipped; framing errors yield one error row and stop
    (framing is content-length-driven — after a bad length nothing
    downstream can be trusted).  ``accept=("conversion",)`` reads WET
    files: conversion blocks have no HTTP envelope, so the block IS
    the payload (sources/wet.py)."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except Exception as exc:
            return [{"url": None, "warc_ts": None, "html": None,
                     "record_type": None, "status": "processing_error",
                     "error_msg": f"gzip: {type(exc).__name__}: {exc}",
                     "source_file": source_file}]
    pages: list[dict] = []
    pos = 0
    while pos < len(data):
        # skip inter-record newlines (spec CRLFs, plus tolerate bare
        # LFs — e.g. the line separator a text sink appends per record)
        while pos < len(data) and data[pos] in (0x0D, 0x0A):
            pos += 1
        if pos >= len(data):
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if not data.startswith(b"WARC/", pos) or hdr_end < 0:
            pages.append({"url": None, "warc_ts": None, "html": None,
                          "record_type": None, "status": "processing_error",
                          "error_msg": f"bad record framing at byte {pos}",
                          "source_file": source_file})
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1"))
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pages.append({"url": None, "warc_ts": None, "html": None,
                          "record_type": headers.get("warc-type"),
                          "status": "processing_error",
                          "error_msg": "missing/invalid Content-Length",
                          "source_file": source_file})
            break
        block = data[hdr_end + 4: hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rtype = headers.get("warc-type", "")
        if rtype not in accept:
            continue
        if rtype == "response":
            http_end = block.find(b"\r\n\r\n")
            body = block[http_end + 4:] if http_end >= 0 else block
        else:
            body = block  # conversion/metadata blocks have no HTTP envelope
        pages.append({
            "url": headers.get("warc-target-uri"),
            "warc_ts": headers.get("warc-date"),
            "html": body,
            "record_type": rtype,
            "status": "ok",
            "error_msg": None,
            "source_file": source_file,
        })
    return pages


def warc_pages_from_binary(files: DataFrame,
                           path_col: str = "path",
                           content_col: str = "content",
                           accept: tuple = ("response",)) -> DataFrame:
    """(path, content) rows -> exploded page rows via an Arrow batch
    kernel.  One task per WARC file (the crawl-scale parallel unit)."""
    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf[path_col], pdf[content_col]):
                rows.extend(parse_warc_bytes(bytes(content), str(path),
                                             accept=accept))
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_PAGE_SCHEMA.fields]
            )

    return files.select(path_col, content_col).mapInPandas(
        kernel, WARC_PAGE_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory/glob of .warc / .warc.gz files into page rows.

    binaryFile loads each file whole — correct for WARC (no internal
    split points without an external index) and bounded by crawl-file
    convention (~1 GB).  Partition parallelism = file count."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
    )
    return warc_pages_from_binary(files)


def build_warc(records: list[tuple[str, str, bytes]],
               gzip_members: bool = False) -> bytes:
    """Synthesize a spec-shaped WARC file: a warcinfo record followed
    by one response record per (url, iso_ts, html).  With
    ``gzip_members`` each record is its own gzip member — the
    .warc.gz convention Common Crawl uses."""
    def record(rtype: str, headers: list[tuple[str, str]],
               block: bytes) -> bytes:
        head = [b"WARC/1.0",
                f"WARC-Type: {rtype}".encode()]
        head += [f"{k}: {v}".encode() for k, v in headers]
        head.append(f"Content-Length: {len(block)}".encode())
        return b"\r\n".join(head) + b"\r\n\r\n" + block + b"\r\n\r\n"

    def gz(b: bytes) -> bytes:
        co = zlib.compressobj(9, zlib.DEFLATED, 31)
        return co.compress(b) + co.flush()

    out = []
    info = record("warcinfo", [("WARC-Date", "2024-01-01T00:00:00Z")],
                  b"software: ocr_spark synthetic\r\n")
    out.append(gz(info) if gzip_members else info)
    for url, ts, html in records:
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html)
        rec = record("response",
                     [("WARC-Target-URI", url), ("WARC-Date", ts)], http)
        out.append(gz(rec) if gzip_members else rec)
    return b"".join(out)
