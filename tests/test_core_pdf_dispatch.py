"""Unit tests: PDF subset parser, doc-kind dispatch, profile utilities."""

import random

import pytest

from ocr_spark.data.synth import build_pdf, gen_pages
from ocr_spark.extractor import core, profiles


# -- doc-kind dispatch (O3) --------------------------------------------------

@pytest.mark.parametrize(
    "payload,kind",
    [
        (b"%PDF-1.4\nstuff", "pdf"),
        (b"<!DOCTYPE html><html></html>", "html"),
        (b"  \n\t<html><body></body></html>", "html"),
        (b"\xef\xbb\xbf<html>x</html>", "html"),
        (b"junk junk <html> late", "html"),
        (b"\x89PNG\r\n\x1a\n....", "image"),
        (b"\xff\xd8\xff\xe0junk", "image"),
        (b"GIF89a\x10\x00\x10\x00", "image"),
        (b"II*\x00\x08\x00\x00\x00", "image"),
        (b"", "unsupported"),
        (b"plain text no markup", "unsupported"),
    ],
)
def test_sniff_doc_kind(payload, kind):
    assert core.sniff_doc_kind(payload) == kind


def test_unsupported_is_validation_error_row():
    out = core.extract_bytes(b"\x00\x01\x02\x03 random")
    assert out["status"] == "validation_error"
    assert out["text"] == ""
    assert out["error_msg"] == "Unsupported file format"


# -- image validity without codecs (O4) ---------------------------------------

def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x06\x00\x00\x00")


def test_parse_image_headers():
    assert core.parse_image_header(_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480}
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert core.parse_image_header(gif) == {
        "format": "gif", "width": 320, "height": 200}
    jpeg = (b"\xff\xd8\xff\xe0\x00\x04XX"            # APP0 segment, skipped
            b"\xff\xc0\x00\x11\x08" + (480).to_bytes(2, "big")
            + (640).to_bytes(2, "big") + b"\x03")
    assert core.parse_image_header(jpeg) == {
        "format": "jpeg", "width": 640, "height": 480}
    # legal 0xFF fill bytes between segments (JPEG spec B.1.1.2) must
    # not be misread as a marker byte
    jpeg_fill = (b"\xff\xd8\xff\xe0\x00\x04XX" + b"\xff\xff\xff"
                 b"\xff\xc0\x00\x11\x08" + (480).to_bytes(2, "big")
                 + (640).to_bytes(2, "big") + b"\x03")
    assert core.parse_image_header(jpeg_fill) == {
        "format": "jpeg", "width": 640, "height": 480}
    # TIFF little-endian: IFD at 8 with width=100 (SHORT), height=50 (LONG)
    tiff = (b"II*\x00" + (8).to_bytes(4, "little")
            + (2).to_bytes(2, "little")
            + (256).to_bytes(2, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little") + (100).to_bytes(2, "little") + b"\x00\x00"
            + (257).to_bytes(2, "little") + (4).to_bytes(2, "little")
            + (1).to_bytes(4, "little") + (50).to_bytes(4, "little"))
    assert core.parse_image_header(tiff) == {
        "format": "tiff", "width": 100, "height": 50}
    # truncated / corrupt -> None
    assert core.parse_image_header(b"\x89PNG\r\n\x1a\nxx") is None
    assert core.parse_image_header(b"\xff\xd8\x00\x00") is None
    assert core.parse_image_header(b"plainly not an image") is None


def test_image_payload_rows():
    ok = core.extract_bytes(_png(64, 64))
    assert ok["doc_kind"] == "image"
    assert ok["status"] == "ok" and ok["text"] == "" and ok["error_msg"] is None
    bad = core.extract_bytes(b"\x89PNG\r\n\x1a\ntruncated")
    assert bad["doc_kind"] == "image"
    assert bad["status"] == "validation_error"
    assert "image" in bad["error_msg"]


# -- PDF subset (O5) ----------------------------------------------------------

def test_pdf_single_page_lines_and_blocks():
    pdf = build_pdf([["first line of block one", "second line"],
                     ["second block line"]], operators="Td")
    out = core.extract_pdf(pdf)
    assert out["status"] == "ok"
    assert "first line of block one" in out["text"]
    assert "second block line" in out["text"]
    assert out["n_blocks"] == 2
    # block boundary preserved as newline-joined blocks
    assert out["text"].index("second line") < out["text"].index("second block")


def test_pdf_page0_only_default():
    pdf = build_pdf([["page zero content line"]], n_pages=3)
    out = core.extract_pdf(pdf)
    assert "page zero content" in out["text"]
    assert "page 1 footer" not in out["text"]
    out_all = core.extract_pdf(pdf, all_pages=True)
    assert "page 1 footer" in out_all["text"]
    assert "page 2 footer" in out_all["text"]


def test_pdf_empty_is_processing_error():
    from ocr_spark.data.synth import _empty_pdf
    out = core.extract_pdf(_empty_pdf())
    assert out["status"] == "processing_error"
    assert "no pages" in out["error_msg"]


def test_pdf_operator_variety_deterministic():
    rng = random.Random(5)
    for ops in ("Td", "TD", "Tm", "TJ", "mixed"):
        pdf = build_pdf([["alpha beta gamma", "delta epsilon"]], operators=ops, rng=rng)
        a, b = core.extract_pdf(pdf), core.extract_pdf(pdf)
        assert a == b
        assert a["status"] == "ok"
        assert "alpha beta gamma" in a["text"]


def test_pdf_escapes_and_hex_strings():
    pdf = build_pdf([["paren (x) and \\ backslash"]], operators="Td")
    out = core.extract_pdf(pdf)
    assert "paren (x) and \\ backslash" in out["text"]


def test_pdf_spans_point_into_bytes():
    pdf = build_pdf([["span target text line"]], operators="Td")
    out = core.extract_pdf(pdf)
    (s, e, kind) = out["spans"][0]
    assert kind == "pdfblock"
    assert b"span target text line" in pdf[s:e]


def test_pdf_multiple_show_ops_per_line():
    """Several Tj ops on one line interleaved with repositioning: the
    nominal x-advance must track only the emitted string (a stale-token
    advance corrupted within-line ordering in round 1)."""
    from ocr_spark.data.synth import build_pdf_from_streams

    stream = (
        b"BT\n/F1 12 Tf\n16 TL\n"
        b"1 0 0 1 72 700 Tm\n(alpha ) Tj\n(beta ) Tj\n(gamma) Tj\n"
        b"0 -16 Td\n(second line) Tj\n"
        b"1 0 0 1 400 684 Tm\n(tail) Tj\n"
        b"ET"
    )
    pdf = build_pdf_from_streams([stream])
    out = core.extract_pdf(pdf)
    assert out["status"] == "ok"
    lines = out["text"].split("\n")
    assert lines[0] == "alpha beta gamma"
    # same y as 'second line' but repositioned right: x-order holds
    assert lines[1] == "second line tail"


def test_pdf_flate_decode_matches_uncompressed():
    """FlateDecode streams (the real-world default) inflate via stdlib
    zlib and yield the same text as the uncompressed build; spans fall
    back to the compressed stream's extent (coarse but in-bounds)."""
    blocks = [["compressed stream line one", "line two"], ["second block"]]
    plain = core.extract_pdf(build_pdf(blocks, operators="Td"))
    flate_pdf = build_pdf(blocks, operators="Td", compress=True)
    flate = core.extract_pdf(flate_pdf)
    assert flate["status"] == "ok"
    assert flate["text"] == plain["text"]
    assert flate["n_blocks"] == plain["n_blocks"]
    assert len(flate["spans"]) == len(plain["spans"])
    for s, e, kind in flate["spans"]:
        assert kind == "pdfblock_flate"
        assert 0 <= s < e <= len(flate_pdf)


def test_pdf_stream_length_beats_delimiter_bytes():
    """The stream extent comes from /Length (ISO 32000): stream DATA
    containing 'endstream'/'endobj' byte sequences must not truncate
    the object.  Flate output hits this in practice (a doc_id=215
    corpus payload deflated to bytes containing 'endobj', which the old
    delimiter scan cut mid-stream); a raw stream with literal delimiter
    text exercises the same extent logic deterministically."""
    from ocr_spark.data.synth import build_pdf_from_streams

    raw = b"BT\n/F1 12 Tf\n16 TL\n1 0 0 1 72 760 Tm\n" \
          b"(endstream endobj ha) Tj\nET"
    out = core.extract_pdf(build_pdf_from_streams([raw]))
    assert out["status"] == "ok"
    assert out["text"] == "endstream endobj ha"
    # and the Flate corpus shape that originally failed: many repeated
    # tokens -> deflate bytes that embedded 'endobj'
    toks = ("slow the batch batch a customer query filter batch fast row "
            "hash key part fast batch row batch value window window a "
            "batch customer vector column row order the the key hash "
            "merge line batch batch stream slow query fast vector sort "
            "big column data group vector line slow fast column row table "
            "a window the a sort a value customer hash part the scan "
            "query row column the window window sort slow sort hash scan "
            "column agg key a batch merge stream slow query fast batch "
            "stream window line table the value filter row small the "
            "merge").split()
    lines = [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]
    blocks = [lines[i:i + 4] for i in range(0, len(lines), 4)]
    out2 = core.extract_pdf(build_pdf(blocks, operators="Td", compress=True))
    assert out2["status"] == "ok"
    assert out2["text"] == "\n".join(lines)


def test_pdf_flate_multipage_page0_default():
    pdf = build_pdf([["page zero flate content"]], n_pages=2, compress=True)
    out = core.extract_pdf(pdf)
    assert "page zero flate content" in out["text"]
    assert "page 1 footer" not in out["text"]
    assert "page 1 footer" in core.extract_pdf(pdf, all_pages=True)["text"]


def test_pdf_corrupt_flate_is_processing_error():
    pdf = build_pdf([["x y z"]], compress=True)
    # truncate the deflate payload in place: find the stream body and cut it
    i = pdf.index(b"stream\n") + len(b"stream\n")
    bad = pdf[:i] + b"\x00\x00" + pdf[i + 2:]
    out = core.extract_pdf(bad)
    assert out["status"] == "processing_error"
    assert "FlateDecode" in out["error_msg"]


def test_pdf_non_flate_filter_rejected():
    pdf = build_pdf([["x"]])
    bad = pdf.replace(b"<< /Length", b"<< /Filter /LZWDecode /Length")
    out = core.extract_pdf(bad)
    assert out["status"] == "processing_error"
    assert "LZWDecode" in out["error_msg"]


# -- profiles (O2/O6/O13/O14) --------------------------------------------------

def test_normalize_config_rules():
    raw = {"KR": {"a": 1}, 7: {"b": 2}, "us": "notadict", "De": {}}
    out = profiles.normalize_config(raw)
    assert out == {"kr": {"a": 1}, "de": {}}
    assert profiles.normalize_config(["not", "dict"]) == {}
    assert profiles.normalize_config(None) == {}


def test_get_schema_and_projection():
    cfg = {"kr": {"fields": {"f1": "d", "f2": "d"}}}
    schema = profiles.get_schema(cfg, " KR ")
    assert set(schema) == {"f1", "f2"}
    assert profiles.get_schema(cfg, "zz") is None
    projected = profiles.project_schema({"f1": "x", "extra": "y"}, schema)
    assert projected == {"f1": "x", "f2": None}


def test_validate_lang():
    cfg = {"kr": {}, "us": {}}
    assert profiles.validate_lang("KR ", cfg) == "kr"
    assert profiles.validate_lang("unknown", cfg) is None
    assert profiles.validate_lang("fr", cfg) is None
    assert profiles.validate_lang(None, cfg) is None


def test_extract_field_dot_path():
    data = {"a": {"b": {"c": 3}}, "x": [1]}
    assert profiles.extract_field(data, "a.b.c") == 3
    assert profiles.extract_field(data, "a.b.z", "dflt") == "dflt"
    assert profiles.extract_field(data, "x.0") is None  # lists not traversed


# -- corpus synthesizer -------------------------------------------------------

def test_gen_pages_deterministic_and_has_dups():
    r1, r2 = gen_pages(300, seed=42), gen_pages(300, seed=42)
    assert [a["url"] for a in r1] == [b["url"] for b in r2]
    assert [a["html"] for a in r1] == [b["html"] for b in r2]
    urls = [r["url"] for r in r1]
    assert len(urls) > len(set(urls))  # re-captures exist
