"""WET sink/source (sources/wet.py): record byte layout, byte-length
semantics on non-ascii text, write->read roundtrip, and plan shape."""

import hashlib
import shutil

from pyspark.sql import functions as F

from ocr_spark.sources.wet import read_wet, wet_export, write_wet


def _df(spark):
    return spark.createDataFrame(
        [("https://a.example.com/1", "2024-01-01T00:05:00Z", "hello world"),
         ("https://a.example.com/2", "2024-01-01T00:06:00Z", "한글 텍스트"),
         ("https://a.example.com/3", "2024-01-01T00:07:00Z", None)],
        "url string, date_iso string, text string")


class TestRecordLayout:
    def test_exact_bytes(self, spark):
        rec = wet_export(_df(spark)).orderBy("url").collect()[0]["wet"]
        url, d, t = "https://a.example.com/1", "2024-01-01T00:05:00Z", \
            "hello world"
        rid = hashlib.md5(f"{url}|{d}".encode()).hexdigest()
        dig = hashlib.sha256(t.encode()).hexdigest()
        expected = (
            f"WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\nWARC-Date: {d}\r\n"
            f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
            f"WARC-Block-Digest: sha256:{dig}\r\n"
            f"Content-Type: text/plain\r\nContent-Length: {len(t.encode())}"
            f"\r\n\r\n{t}\r\n\r\n")
        assert rec == expected

    def test_content_length_is_bytes_not_chars(self, spark):
        rec = [r["wet"] for r in wet_export(_df(spark)).collect()
               if "/2" in r["url"]][0]
        t = "한글 텍스트"
        assert f"Content-Length: {len(t.encode('utf-8'))}" in rec
        assert f"Content-Length: {len(t)}\r" not in rec

    def test_null_text_serializes_empty(self, spark):
        rec = [r["wet"] for r in wet_export(_df(spark)).collect()
               if "/3" in r["url"]][0]
        assert "Content-Length: 0\r\n\r\n\r\n\r\n" in rec

    def test_plan_is_narrow_jvm_only(self, spark):
        plan = (wet_export(_df(spark))
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestRoundtrip:
    def test_write_then_read(self, spark, tmp_path):
        out = str(tmp_path / "wet_out")
        # .wet suffix dir contents: text sink writes part-* files; the
        # read glob matches *.wet* so rename via a second dir
        recs = wet_export(_df(spark))
        write_wet(recs.repartition(1), out)
        import glob
        import os
        part = glob.glob(out + "/part-*.txt") + glob.glob(out + "/part-*")
        wet_dir = str(tmp_path / "wetfiles")
        os.makedirs(wet_dir, exist_ok=True)
        shutil.copy(part[0], wet_dir + "/CC-TEST-0000.warc.wet")
        back = read_wet(spark, wet_dir)
        got = {r["url"]: (r["warc_ts"], r["text"], r["status"])
               for r in back.collect()}
        assert set(got) == {"https://a.example.com/1",
                            "https://a.example.com/2",
                            "https://a.example.com/3"}
        assert got["https://a.example.com/1"] == (
            "2024-01-01T00:05:00Z", "hello world", "ok")
        assert got["https://a.example.com/2"][1] == "한글 텍스트"
        assert got["https://a.example.com/3"][1] == ""

    def test_read_skips_non_conversion_records(self, spark, tmp_path):
        from ocr_spark.sources.warc import build_warc
        d = tmp_path / "mixed"
        d.mkdir()
        # a response-record WARC named .wet must yield no conversion rows
        (d / "x.warc.wet").write_bytes(build_warc(
            [("https://r.example.com/", "2024-01-01T00:00:00Z", b"<p>x</p>")]))
        assert read_wet(spark, str(d)).count() == 0


class TestWat:
    def test_payload_is_valid_json_with_escapes(self, spark):
        import json as _json

        from ocr_spark.sources.wet import wat_export
        df = spark.createDataFrame(
            [("https://x.com/1", "2024-01-01T00:00:00Z",
              'He said "hi" \\ bye', ["https://a.com", "https://b.com"]),
             ("https://x.com/2", "2024-01-01T00:01:00Z", None, None)],
            "url string, date_iso string, title string, "
            "outlinks array<string>")
        got = {r["url"]: r["wat"] for r in wat_export(df).collect()}
        for url, rec in got.items():
            payload = rec.split("\r\n\r\n")[1]
            obj = _json.loads(payload)   # must round-trip as real JSON
            assert obj["url"] == url
            assert obj["n_outlinks"] == len(obj["outlinks"])
        assert _json.loads(got["https://x.com/1"].split("\r\n\r\n")[1])[
            "title"] == 'He said "hi" \\ bye'
        assert "Content-Type: application/json" in got["https://x.com/1"]

    def test_content_length_matches_payload_bytes(self, spark):
        from ocr_spark.sources.wet import wat_export
        df = spark.createDataFrame(
            [("https://x.com/1", "2024-01-01T00:00:00Z", "한글", ["u"])],
            "url string, date_iso string, title string, "
            "outlinks array<string>")
        rec = wat_export(df).collect()[0]["wat"]
        head, payload = rec.split("\r\n\r\n")[:2]
        declared = int(head.split("Content-Length: ")[1].split("\r\n")[0])
        assert declared == len(payload.encode("utf-8"))
