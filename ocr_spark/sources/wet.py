"""WET sink/source: Common-Crawl-style extracted-text records.

Common Crawl distributes extraction output as WET files — WARC/1.0
``conversion`` records whose block is the extracted plain text of one
page.  This module closes the pipeline's output loop: the engine's
extracted corpus serializes to the interchange format other crawl
tooling consumes, and WET files from elsewhere read back into the
engine.

Record layout (one per page)::

    WARC/1.0\\r\\n
    WARC-Type: conversion\\r\\n
    WARC-Target-URI: <url>\\r\\n
    WARC-Date: <iso-8601, second precision, Z>\\r\\n
    WARC-Record-ID: <urn:md5:<md5(url|date)>>\\r\\n
    WARC-Block-Digest: sha256:<hex of text bytes>\\r\\n
    Content-Type: text/plain\\r\\n
    Content-Length: <BYTE length of text>\\r\\n
    \\r\\n
    <text>\\r\\n\\r\\n

Two documented deviations from Common Crawl's conventions, both for
cross-engine determinism: the record id is an md5 urn (CC uses random
uuids — useless for a reproducible pipeline) and the block digest is
hex sha-256 (CC uses base32 sha-1, which the SQL oracle engine cannot
compute; sha-256 is the stronger digest anyway).

Scale shape: record assembly is pure built-in column expressions
(concat / md5 / sha2 / octet_length — zero Python, zero shuffle), and
:func:`write_wet` streams records through the text sink one file per
partition — the crawl convention of ~1 GB WET files falls out of
partition sizing, not a coalesce.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ocr_spark.sources.warc import warc_pages_from_binary

__all__ = ["wet_record", "wet_export", "write_wet", "read_wet",
           "json_string", "wat_record", "wat_export"]

_CRLF = "\r\n"


def _record(rtype: str, ctype: str, url: Column, date_iso: Column,
            block: Column) -> Column:
    """Shared WARC record framing (string column, built-ins only).
    ``date_iso`` must already be the second-precision ISO-8601 Z
    string (the caller formats; WARC-Date is verbatim)."""
    return F.concat(
        F.lit("WARC/1.0" + _CRLF + f"WARC-Type: {rtype}" + _CRLF
              + "WARC-Target-URI: "), url,
        F.lit(_CRLF + "WARC-Date: "), date_iso,
        F.lit(_CRLF + "WARC-Record-ID: <urn:md5:"),
        F.md5(F.encode(F.concat(url, F.lit("|"), date_iso), "utf-8")),
        F.lit(">" + _CRLF + "WARC-Block-Digest: sha256:"),
        F.sha2(F.encode(block, "utf-8"), 256),
        F.lit(_CRLF + f"Content-Type: {ctype}" + _CRLF
              + "Content-Length: "),
        F.octet_length(F.encode(block, "utf-8")).cast("string"),
        F.lit(_CRLF + _CRLF), block, F.lit(_CRLF + _CRLF),
    )


def wet_record(url: Column, date_iso: Column, text: Column) -> Column:
    """One serialized WET conversion record."""
    return _record("conversion", "text/plain", url, date_iso, text)


def json_string(col: Column) -> Column:
    """Minimal JSON string serialization (escape backslash then quote,
    wrap in quotes) — explicit concat, NOT to_json, so the DuckDB
    oracle builds the byte-identical payload (engine JSON writers
    disagree on spacing/ordering).  Control characters inside values
    are out of contract (extracted text is cleaned upstream)."""
    esc = F.regexp_replace(
        F.regexp_replace(col, F.lit("\\\\"), F.lit("\\\\\\\\")),
        F.lit("\""), F.lit("\\\\\""))
    return F.concat(F.lit('"'), esc, F.lit('"'))


def wat_record(url: Column, date_iso: Column, title: Column,
               outlinks: Column) -> Column:
    """One serialized WAT metadata record: same WARC framing, block is
    the (simplified, documented) JSON envelope

        {"url":..., "date":..., "title":..., "n_outlinks":N,
         "outlinks":[...]}

    — the per-page metadata sidecar Common Crawl ships alongside WET.
    ``outlinks`` is an array<string> column."""
    payload = F.concat(
        F.lit('{"url":'), json_string(url),
        F.lit(',"date":'), json_string(date_iso),
        F.lit(',"title":'), json_string(title),
        F.lit(',"n_outlinks":'), F.size(outlinks).cast("string"),
        F.lit(',"outlinks":['),
        F.array_join(F.transform(outlinks, json_string), ","),
        F.lit("]}"),
    )
    return _record("metadata", "application/json", url, date_iso, payload)


def wat_export(df: DataFrame, url_col: str = "url",
               date_col: str = "date_iso", title_col: str = "title",
               outlinks_col: str = "outlinks") -> DataFrame:
    """Pages (with pre-extracted title/outlinks — operators/web.py
    outlinks + extractor extract_meta produce them) -> ``(url, wat)``
    serialized metadata records; narrow map, no shuffle."""
    return df.select(
        F.col(url_col).alias("url"),
        wat_record(
            F.col(url_col), F.col(date_col),
            F.coalesce(F.col(title_col), F.lit("")),
            F.coalesce(F.col(outlinks_col),
                       F.array().cast("array<string>")),
        ).alias("wat"),
    )


def wet_export(df: DataFrame, url_col: str = "url",
               date_col: str = "date_iso",
               text_col: str = "text") -> DataFrame:
    """Extracted pages -> ``(url, wet)`` serialized conversion records
    (narrow map, no shuffle).  NULL text serializes as empty text —
    error rows should be filtered upstream by status."""
    return df.select(
        F.col(url_col).alias("url"),
        wet_record(
            F.col(url_col), F.col(date_col),
            F.coalesce(F.col(text_col), F.lit("")),
        ).alias("wet"),
    )


def write_wet(records: DataFrame, path: str,
              record_col: str = "wet") -> None:
    """Write serialized records via the text sink — records already
    end with CRLF CRLF, so concatenated rows form a valid WET file;
    one file per partition (size WET files by partitioning upstream)."""
    records.select(F.col(record_col).alias("value")).write.mode(
        "overwrite").text(path)


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET files back: one row per conversion record with the
    text decoded (utf-8, replacement on undecodable bytes — WET is
    text/plain by contract)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.wet*")
        .load(path)
    )
    pages = warc_pages_from_binary(files, accept=("conversion",))
    return pages.select(
        "url", "warc_ts",
        F.decode(F.col("html"), "UTF-8").alias("text"),
        "status", "error_msg", "source_file",
    )
