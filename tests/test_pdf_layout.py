"""Unit tests: XY-cut page segmentation / multi-column reading order.

The reference rasterizes PDF pages and delegates layout to its OCR
model (reference services/file_processor.py:77, services/
gemini_service.py:61-146); this engine reconstructs reading order
geometrically with recursive XY-cut (core._xy_cut).  These tests pin
the two contract points: (1) multi-column pages read column-by-column,
(2) single-column extraction is byte-identical to the pre-XY-cut
behavior (the cut thresholds are strictly coarser than block splits).
"""

from ocr_spark.data.synth import (
    TWOCOL_TOKEN_CAP,
    build_pdf,
    build_pdf_from_streams,
    build_pdf_two_column,
)
from ocr_spark.extractor import core


def test_two_column_reading_order():
    left = [f"left{i}" for i in range(5)]
    right = [f"right{i}" for i in range(4)]
    out = core.extract_pdf(build_pdf_two_column("Doc Title", left, right))
    assert out["status"] == "ok"
    # title band, left column block, right column block — in that order
    assert out["text"] == "Doc Title\n" + "\n".join(left) + "\n" + "\n".join(right)
    assert out["n_blocks"] == 3
    # spans: one per block, valid and ordered
    assert len(out["spans"]) == 3
    for s, e, kind in out["spans"]:
        assert 0 <= s <= e
        assert kind == "pdfblock"


def test_two_column_not_interleaved():
    """The failure mode XY-cut exists to prevent: y-sorted assembly
    would merge same-baseline lines across the gutter."""
    out = core.extract_pdf(build_pdf_two_column("t", ["A0", "A1"], ["B0", "B1"]))
    assert "A0 B0" not in out["text"]
    assert out["text"] == "t\nA0\nA1\nB0\nB1"


def test_two_column_compressed_matches_plain():
    left, right = ["x1", "x2"], ["y1", "y2"]
    plain = core.extract_pdf(build_pdf_two_column("t", left, right))
    flate = core.extract_pdf(build_pdf_two_column("t", left, right, compress=True))
    assert plain["text"] == flate["text"]
    assert plain["n_blocks"] == flate["n_blocks"]


def test_two_column_token_cap():
    """Lines are capped to TWOCOL_TOKEN_CAP chars so the left column can
    never reach across the gutter (the oracle applies the same cap)."""
    long = "abcdefghijklmnopqrstuvwxyz"
    out = core.extract_pdf(build_pdf_two_column("t", [long, "l1"], ["r0", "r1"]))
    assert out["text"] == f"t\n{long[:TWOCOL_TOKEN_CAP]}\nl1\nr0\nr1"


def test_single_line_sides_stay_one_line():
    """An x-gap between two lone runs on a shared baseline is intra-line
    positioning, not a column cut (>=2 baselines per side required)."""
    out = core.extract_pdf(build_pdf_two_column("t", ["solo"], ["tail"]))
    assert out["text"] == "t\nsolo tail"


def test_empty_columns_only_title():
    out = core.extract_pdf(build_pdf_two_column("only title", [], []))
    assert out["text"] == "only title"
    assert out["n_blocks"] == 1


def test_single_column_unchanged_by_xy_cut():
    """Regression pin: the conservative thresholds leave ordinary
    single-column documents byte-identical — every y-cut boundary
    (>3x leading) is already a block boundary (>1.8x leading)."""
    blocks = [[f"block{b} line{i} words here" for i in range(3)]
              for b in range(4)]
    for ops in ("Td", "TD", "Tm", "TJ", "mixed"):
        out = core.extract_pdf(build_pdf(blocks, operators=ops))
        assert out["status"] == "ok"
        assert out["n_blocks"] == 4
        assert out["text"] == "\n".join("\n".join(b) for b in blocks)


def test_xy_cut_requires_gutter_no_run_crosses():
    """A long line spanning the would-be gutter keeps the page single
    column (subset policy: a gutter must be crossed by NO run)."""
    stream = b"""BT
/F1 12 Tf
16 TL
1 0 0 1 72 700 Tm
(aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa) Tj
1 0 0 1 72 684 Tm
(left) Tj
1 0 0 1 340 684 Tm
(right) Tj
ET"""
    out = core.extract_pdf(build_pdf_from_streams([stream]))
    # no segmentation: second baseline keeps both runs on one line
    assert out["text"].splitlines()[1] == "left right"


def test_xy_cut_recursion_row_of_cells():
    """Two bands where only the lower band has a gutter: the y-cut
    recurses and the x-cut applies inside the band it belongs to."""
    stream = b"""BT
/F1 12 Tf
16 TL
1 0 0 1 72 760 Tm
(header spans just the left area) Tj
1 0 0 1 72 700 Tm
(c1a) Tj
1 0 0 1 72 684 Tm
(c1b) Tj
1 0 0 1 340 700 Tm
(c2a) Tj
1 0 0 1 340 684 Tm
(c2b) Tj
ET"""
    out = core.extract_pdf(build_pdf_from_streams([stream]))
    assert out["text"] == "header spans just the left area\nc1a\nc1b\nc2a\nc2b"
    assert out["n_blocks"] == 3
