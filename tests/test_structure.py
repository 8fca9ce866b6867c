"""Structure-preserving extraction (operators/structure.py): table
grid semantics, markdown rendering contract, charset handling,
malformed-markup tolerance, and plan shape."""

from pyspark.sql import functions as F

from ocr_spark.operators.structure import (extract_tables, html_markdown,
                                           parse_tables, to_markdown)


class TestParseTables:
    def test_header_and_grid(self):
        cells = parse_tables(
            b"<table><tr><th>a</th><th>b</th></tr>"
            b"<tr><td>1</td><td>2</td></tr></table>")
        assert cells == [(0, 0, 0, True, "a"), (0, 0, 1, True, "b"),
                         (0, 1, 0, False, "1"), (0, 1, 1, False, "2")]

    def test_ragged_rows_keep_their_own_width(self):
        cells = parse_tables(
            b"<table><tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
        assert (0, 1, 0, False, "c") in cells
        assert len(cells) == 3

    def test_nested_table_own_index_no_leak(self):
        cells = parse_tables(
            b"<table><tr><td>x<table><tr><td>inner</td></tr></table>"
            b"</td><td>y</td></tr></table>")
        by_tbl = {}
        for t, r, c, h, txt in cells:
            by_tbl.setdefault(t, []).append(txt)
        assert by_tbl[1] == ["inner"]
        assert by_tbl[0] == ["x", "y"]

    def test_unclosed_table_committed_at_eof(self):
        cells = parse_tables(b"<table><tr><td>a</td><td>b")
        assert cells == [(0, 0, 0, False, "a"), (0, 0, 1, False, "b")]

    def test_entities_and_whitespace_collapse(self):
        cells = parse_tables(b"<table><tr><td> a &amp;\n b </td></tr></table>")
        assert cells[0][4] == "a & b"

    def test_non_table_text_ignored(self):
        assert parse_tables(b"<p>no tables here</p>") == []

    def test_cp949_charset_sniffed(self):
        html = ('<html><head><meta charset="euc-kr"></head><body>'
                "<table><tr><td>상호</td></tr></table></body></html>"
                ).encode("cp949")
        assert parse_tables(html)[0][4] == "상호"


class TestToMarkdown:
    def test_full_feature_page(self):
        md = to_markdown(
            b"<h2>Title Here</h2><p>body <b>bold</b> and <i>it</i></p>"
            b'<ul><li>one</li><li>two<ul><li>deep</li></ul></li></ul>'
            b'<ol><li>first</li><li>second</li></ol>'
            b'<p><a href="/x">link text</a></p><hr>'
            b"<blockquote><p>quoted</p></blockquote>"
            b"<pre>keep   space\n  indent</pre>")
        assert md.split("\n\n") == [
            "## Title Here",
            "body **bold** and *it*",
            "- one\n- two\n  - deep",
            "1. first\n2. second",
            "[link text](/x)",
            "---",
            "> quoted",
            "```\nkeep   space\n  indent\n```",
        ]

    def test_script_style_skipped(self):
        md = to_markdown(
            b"<script>var x = 'hidden';</script><style>p{}</style><p>kept</p>")
        assert md == "kept"

    def test_table_renders_as_pipe_table(self):
        md = to_markdown(
            b"<table><tr><th>h1</th><th>h2</th></tr>"
            b"<tr><td>a</td><td>b</td></tr><tr><td>c</td></tr></table>")
        assert md == "| h1 | h2 |\n| --- | --- |\n| a | b |\n| c |  |"

    def test_img_and_br(self):
        md = to_markdown(b'<p>a<br>b <img src="/i.png" alt="pic"></p>')
        assert md == "a b ![pic](/i.png)"

    def test_empty_page_empty_string(self):
        assert to_markdown(b"") == ""
        assert to_markdown(b"<html><body>   </body></html>") == ""

    def test_stray_li_without_list(self):
        assert to_markdown(b"<li>item</li>") == "- item"

    def test_broken_markup_tolerated(self):
        md = to_markdown(b"<p>open <b>bold<p>next para")
        assert "open" in md and "next para" in md


class TestSparkOperators:
    def _pages(self, spark):
        return spark.createDataFrame(
            [(1, bytearray(b"<table><tr><td>a</td><td>b</td></tr></table>")),
             (2, bytearray(b"<p>no table</p>")),
             (3, None)],
            "doc_id long, html binary")

    def test_extract_tables_rows(self, spark):
        out = extract_tables(self._pages(spark), passthrough=("doc_id",))
        rows = [tuple(r) for r in out.orderBy("doc_id", "col_idx").collect()]
        assert rows == [(1, 0, 0, 0, False, "a"), (1, 0, 0, 1, False, "b")]

    def test_html_markdown_rows_and_nulls(self, spark):
        out = html_markdown(self._pages(spark), passthrough=("doc_id",))
        got = {r["doc_id"]: r["markdown"] for r in out.collect()}
        assert got[2] == "no table"
        assert got[3] is None

    def test_plan_is_narrow_arrow_batched(self, spark):
        df = self._pages(spark)
        for op in (extract_tables(df, passthrough=("doc_id",)),
                   html_markdown(df, passthrough=("doc_id",))):
            plan = op._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert "BatchEvalPython" not in plan
            assert "ArrowEvalPython" in plan or "MapInArrow" in plan or \
                "PythonMapInArrow" in plan


class TestTableRecords:
    def test_header_pairing_and_headerless_skip(self, spark):
        from ocr_spark.operators.structure import (extract_tables,
                                                   table_records)

        html = (b"<html><body>"
                b"<table><tr><th>name</th><th>age</th></tr>"
                b"<tr><td>ann</td><td>3</td></tr>"
                b"<tr><td>bo</td><td>5</td><td>extra</td></tr></table>"
                b"<table><tr><td>no</td><td>header</td></tr></table>"
                b"</body></html>")
        df = spark.createDataFrame([(1, bytearray(html))],
                                   "doc_id long, html binary")
        cells = extract_tables(df, passthrough=("doc_id",))
        got = {(r.record_idx, r.field): r.value
               for r in table_records(cells).collect()}
        # ragged 'extra' cell (col 2, no header) drops; table 1
        # (headerless) emits nothing
        assert got == {
            (0, "name"): "ann", (0, "age"): "3",
            (1, "name"): "bo", (1, "age"): "5",
        }
