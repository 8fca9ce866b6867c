"""WARC source: framing, gzip members, error rows, and the Spark
binaryFile -> pages -> extraction path on real files on disk."""

from ocr_spark.extractor.core import extract_bytes
from ocr_spark.sources.warc import (build_warc, parse_warc_bytes, read_warc)


def test_parse_round_trip_plain_and_gzip():
    recs = [("https://a.com/1", "2024-05-01T10:00:00Z", b"<html>one</html>"),
            ("https://b.com/2", "2024-05-01T11:00:00Z",
             "<html>téxt</html>".encode())]
    for gz in (False, True):
        pages = parse_warc_bytes(build_warc(recs, gzip_members=gz))
        assert [(p["url"], p["html"]) for p in pages] == [
            ("https://a.com/1", b"<html>one</html>"),
            ("https://b.com/2", "<html>téxt</html>".encode()),
        ], f"gz={gz}"
        assert all(p["status"] == "ok" for p in pages)
        # warcinfo record skipped, not surfaced
        assert all(p["record_type"] == "response" for p in pages)


def test_parse_errors_are_rows_not_exceptions():
    assert parse_warc_bytes(b"not a warc")[0]["status"] == "processing_error"
    # corrupt Content-Length
    data = build_warc([("u", "t", b"x")])
    bad = data.replace(b"Content-Length", b"Content-Lie", 1)
    rows = parse_warc_bytes(bad)
    assert rows and rows[0]["status"] == "processing_error"
    # truncated gzip
    gz = build_warc([("u", "t", b"x" * 100)], gzip_members=True)[:-30]
    rows = parse_warc_bytes(gz)
    assert isinstance(rows, list)  # no exception; rows (possibly error)


def test_read_warc_files_through_spark(spark, tmp_path):
    """binaryFile source -> record split -> byte-identical extraction,
    with one plain and one gzip-member file in the same directory."""
    wrap = lambda body: (b"<html><body><article><p>" + body
                         + b"</p></article></body></html>")
    f1 = [("https://x.test/a", "2024-01-01T00:00:00Z", wrap(b"first doc body here")),
          ("https://x.test/b", "2024-01-01T00:01:00Z", wrap(b"second doc body here"))]
    f2 = [("https://y.test/c", "2024-01-02T00:00:00Z", wrap(b"third doc body here"))]
    (tmp_path / "f1.warc").write_bytes(build_warc(f1))
    (tmp_path / "f2.warc.gz").write_bytes(build_warc(f2, gzip_members=True))
    (tmp_path / "ignored.txt").write_bytes(b"nope")  # glob must skip this

    pages = read_warc(spark, str(tmp_path))
    got = {r["url"]: (r["warc_ts"], bytes(r["html"]), r["source_file"])
           for r in pages.collect()}
    assert set(got) == {"https://x.test/a", "https://x.test/b",
                        "https://y.test/c"}
    for url, ts, html in f1 + f2:
        assert got[url][0] == ts
        assert got[url][1] == html
        # extraction on the recovered bytes matches the oracle kernel
        assert extract_bytes(got[url][1])["text"] == \
            extract_bytes(html)["text"]
    assert got["https://y.test/c"][2].endswith("f2.warc.gz")
