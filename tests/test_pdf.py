"""operators/pdf — stdlib-only PDF text extraction (xref chains,
COS parser, page tree, FlateDecode, BT/ET text operators) and the
spec-conformant fixture writer."""

from __future__ import annotations

import zlib

import pytest

from flycatcher_spark.operators import multimodal
from flycatcher_spark.operators.pdf import (
    _Lexer,
    _page_text,
    encode_pdf,
    parse_pdf,
)


class TestCosParser:
    def _one(self, raw: bytes):
        return _Lexer(raw).parse()

    def test_scalars(self):
        assert self._one(b" true ") is True
        assert self._one(b"false") is False
        assert self._one(b"null") is None
        assert self._one(b"42") == 42
        assert self._one(b"-17") == -17
        assert self._one(b"3.5") == 3.5
        assert self._one(b"-.25") == -0.25

    def test_reference_vs_bare_numbers(self):
        # `3 0 R` is a ref; `3 0 4` is just the number 3
        v = self._one(b"3 0 R")
        assert v.num == 3
        assert self._one(b"3 0 4") == 3
        # `R` followed by a letter is NOT the ref keyword
        assert self._one(b"3 0 Rx") == 3

    def test_names_with_hex_escapes(self):
        assert self._one(b"/Type") == "/Type"
        assert self._one(b"/A#20B") == "/A B"

    def test_nested_dict_and_array(self):
        v = self._one(b"<< /A [1 2 (x)] /B << /C /D >> >>")
        assert v["/A"][:2] == [1, 2]
        assert v["/A"][2] == b"x"
        assert v["/B"]["/C"] == "/D"

    def test_literal_string_escapes(self):
        assert self._one(rb"(a\(b\)c)") == b"a(b)c"
        assert self._one(rb"(tab\there)") == b"tab\there"
        assert self._one(rb"(\101BC)") == b"ABC"  # octal
        assert self._one(rb"(\53)") == b"+"  # 2-digit octal
        assert self._one(b"(line\\\ncont)") == b"linecont"  # continuation
        assert self._one(rb"(back\\slash)") == b"back\\slash"
        # unknown escape: char stands for itself
        assert self._one(rb"(\q)") == b"q"

    def test_literal_string_balanced_parens(self):
        # unescaped but BALANCED parens are legal inside literals
        assert self._one(b"(a (nested (deep)) b)") == b"a (nested (deep)) b"

    def test_hex_strings(self):
        assert self._one(b"<48 65 6C 6C 6F>") == b"Hello"
        assert self._one(b"<48656C6C6F2>") == b"Hello "  # odd → pad 0

    def test_comments_skipped(self):
        assert self._one(b"% noise\n 7") == 7

    def test_unterminated_string_raises(self):
        with pytest.raises(ValueError):
            self._one(b"(never closed")


class TestPageText:
    def test_tj_and_line_moves(self):
        c = b"BT /F1 12 Tf 72 720 Td (one) Tj 0 -14 Td (two) Tj ET"
        assert _page_text(c) == "one\ntwo"

    def test_tj_array_kern_heuristic(self):
        # kern below -100 is a word gap; small kerns are not
        c = b"BT [(a) -250 (b) -40 (c)] TJ ET"
        assert _page_text(c) == "a bc"

    def test_quote_operators_start_new_lines(self):
        c = b"BT (first) Tj (second) ' 1 2 (third) \" ET"
        assert _page_text(c) == "first\nsecond\nthird"

    def test_tm_and_tstar_newlines(self):
        c = b"BT (a) Tj 1 0 0 1 72 700 Tm (b) Tj T* (c) Tj ET"
        assert _page_text(c) == "a\nb\nc"

    def test_non_text_operators_ignored(self):
        c = (b"q 0.5 0 0 0.5 0 0 cm /Im1 Do Q "
             b"BT (x) Tj ET 100 200 m 300 400 l S")
        assert _page_text(c) == "x"


class TestRoundTrip:
    PAGES = [["Hello world", "second (line)"], ["page two here"]]
    TEXT = "Hello world\nsecond (line)\npage two here"

    @pytest.mark.parametrize("variant", [0, 1, 2, 3])
    def test_all_show_op_variants(self, variant):
        m = parse_pdf(encode_pdf(self.PAGES, variant=variant))
        assert m["n_pages"] == 2
        assert m["text"] == self.TEXT
        assert m["n_chars"] == len(self.TEXT)

    @pytest.mark.parametrize("compress", [False, True])
    @pytest.mark.parametrize("nest", [False, True])
    @pytest.mark.parametrize("split", [False, True])
    def test_structural_axes(self, compress, nest, split):
        m = parse_pdf(
            encode_pdf(self.PAGES, compress=compress, nest_kids=nest,
                       split_contents=split)
        )
        assert m["n_pages"] == 2
        assert m["text"] == self.TEXT

    def test_incremental_update_chain(self):
        body = encode_pdf(self.PAGES, incremental_title="rev1")
        # the update really appends a second xref section
        assert body.count(b"startxref") == 2
        assert b"/Prev" in body
        m = parse_pdf(body)
        assert m["n_pages"] == 2 and m["text"] == self.TEXT

    def test_empty_page_list_of_lines(self):
        m = parse_pdf(encode_pdf([[]]))
        assert m["n_pages"] == 1 and m["text"] == ""

    def test_latin1_bytes_survive(self):
        m = parse_pdf(encode_pdf([["caf\xe9 \xfc"]]))
        assert m["text"] == "caf\xe9 \xfc"


class TestHonestNone:
    def test_non_pdf(self):
        assert parse_pdf(b"GIF89a whatever") is None
        assert parse_pdf(b"") is None
        assert parse_pdf(None) is None

    def test_truncated(self):
        body = encode_pdf([["x y"]])
        assert parse_pdf(body[: len(body) // 3]) is None

    def test_encrypted_marker(self):
        assert parse_pdf(encode_pdf([["x"]], encrypt_marker=True)) is None

    def test_xref_stream_unsupported(self):
        # splice the startxref target onto an object (what a PDF 1.5
        # xref STREAM looks like to the chain walker) → honest None
        body = bytearray(encode_pdf([["x"]]))
        pos = body.rindex(b"startxref")
        end = body.index(b"\n%%EOF", pos)
        patched = body[:pos] + b"startxref\n9\n%%EOF\n"
        assert parse_pdf(bytes(patched)) is None
        assert end  # silence unused warning

    def test_unsupported_filter(self):
        body = encode_pdf([["x y"]], compress=True)
        assert parse_pdf(body.replace(b"/FlateDecode", b"/LZWDecodeXX")) is None

    def test_corrupt_deflate(self):
        body = bytearray(encode_pdf([["hello world"]], compress=True))
        z = zlib.compress(b"BT (hello world) Tj ET")
        i = body.find(z[:8])
        if i != -1:
            body[i + 4] ^= 0xFF
            assert parse_pdf(bytes(body)) is None

    def test_missing_root(self):
        body = encode_pdf([["x"]])
        assert parse_pdf(body.replace(b"/Root", b"/Rool")) is None


class TestSniff:
    def test_sniff_labels_pdf(self):
        assert multimodal.sniff_format(encode_pdf([["x"]])) == "pdf"
        assert multimodal.sniff_format(b"%PDF-1.7\n...") == "pdf"


class TestSparkPlumbing:
    def test_extract_pdf_text_plan_and_values(self, spark):
        from flycatcher_spark.operators.pdf import (
            extract_pdf_text,
            make_pdf_payload,
        )

        docs = spark.range(0, 40).withColumnRenamed("id", "doc_id")
        out = extract_pdf_text(make_pdf_payload(docs)).orderBy("doc_id")
        rows = out.collect()
        assert len(rows) == 40
        for r in rows:
            i = r["doc_id"]
            want = "\n".join(
                f"Doc {i} page {p}\nbody {(i * 7 + p) % 97} (pdf)"
                for p in range(1 + i % 3)
            )
            assert r["n_pages"] == 1 + i % 3
            assert r["text"] == want
            assert r["n_chars"] == len(want)

    def test_corrupt_payload_yields_null_row(self, spark):
        from pyspark.sql import functions as F

        from flycatcher_spark.operators.pdf import extract_pdf_text

        df = spark.range(0, 3).select(
            F.col("id").alias("doc_id"),
            F.lit(b"junk bytes").alias("payload"),
        )
        rows = extract_pdf_text(df).collect()
        assert all(r["text"] is None and r["n_pages"] is None for r in rows)

    def test_map_only_plan(self, spark):
        from flycatcher_spark import plans
        from flycatcher_spark.operators.pdf import (
            extract_pdf_text,
            make_pdf_payload,
        )

        docs = spark.range(0, 10).withColumnRenamed("id", "doc_id")
        out = extract_pdf_text(make_pdf_payload(docs))
        plans.assert_no_shuffle(out)
