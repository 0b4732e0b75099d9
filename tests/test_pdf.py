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

    def test_startxref_at_garbage(self):
        # startxref into the middle of the header: neither a classic
        # table nor a parseable XRef stream object → honest None
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


# ---------------------------------------------------------------------------
# r9: PDF 1.5 — cross-reference streams, object streams, predictors
# ---------------------------------------------------------------------------
from flycatcher_spark.operators.pdf import _unpredict  # noqa: E402

PAGES_15 = [["Doc 9 page 0", "body 63 (pdf)"], ["Doc 9 page 1", "body 70 (pdf)"]]
WANT_15 = "Doc 9 page 0\nbody 63 (pdf)\nDoc 9 page 1\nbody 70 (pdf)"


class TestXrefStreams:
    @pytest.mark.parametrize("objstm", [False, True])
    @pytest.mark.parametrize("pred", [None, 2, 12, 15])
    @pytest.mark.parametrize("compress", [False, True])
    def test_round_trip_matrix(self, objstm, pred, compress):
        body = encode_pdf(
            PAGES_15,
            compress=compress,
            xref_stream=True,
            objstm=objstm,
            xref_predictor=pred,
        )
        assert body.startswith(b"%PDF-1.5")
        m = parse_pdf(body)
        assert m is not None and m["n_pages"] == 2
        assert m["text"] == WANT_15

    def test_objstm_members_resolved_through_pair_table(self):
        # the catalog, pages node, page dicts and font all live inside
        # the ObjStm — only content streams + ObjStm + XRef stream are
        # standalone objects in the file body
        body = encode_pdf(PAGES_15, objstm=True, compress=True)
        import re as _re
        standalone = _re.findall(rb"(\d+) 0 obj", body)
        # 2 content streams + 1 ObjStm + 1 XRef stream
        assert len(standalone) == 4
        assert b"/ObjStm" in body
        assert parse_pdf(body)["text"] == WANT_15

    def test_mixed_chain_classic_over_stream_base(self):
        # incremental classic section whose /Prev points at the XRef
        # STREAM: the walker must switch flavors mid-chain
        body = encode_pdf(
            PAGES_15, xref_stream=True, objstm=True,
            incremental_title="rev9",
        )
        assert b"trailer" in body and b"/Type /XRef" in body
        m = parse_pdf(body)
        assert m is not None and m["text"] == WANT_15

    def test_hybrid_xrefstm_side_stream(self):
        # hand-built hybrid-reference shape: startxref -> a classic
        # table with NO entries whose trailer carries /XRefStm pointing
        # at the real xref stream (ISO 32000 §7.5.8.4)
        base = encode_pdf(PAGES_15, xref_stream=True)
        pos = base.rindex(b"startxref")
        stream_pos = int(base[pos:].split()[1])
        hybrid = bytearray(base)
        classic_at = len(hybrid)
        hybrid += (
            b"xref\n0 1\n0000000000 65535 f \n"
            b"trailer\n<< /Size 99 /Root 1 0 R /XRefStm %d >>\n"
            b"startxref\n%d\n%%%%EOF\n" % (stream_pos, classic_at)
        )
        m = parse_pdf(bytes(hybrid))
        assert m is not None and m["text"] == WANT_15

    def test_corrupt_predictor_row_is_honest_none(self):
        body = bytearray(encode_pdf(PAGES_15, xref_stream=True,
                                    xref_predictor=12))
        # corrupt the xref stream's deflate payload (the stream that
        # follows the /Type /XRef dict)
        i = body.index(b"stream\n", body.index(b"/Type /XRef")) + 7
        body[i + 3] ^= 0xFF
        assert parse_pdf(bytes(body)) is None

    def test_indirect_length_in_xref_stream_rejected(self):
        body = encode_pdf(PAGES_15, xref_stream=True)
        # /Length N -> /Length 5 0 R inside the XRef dict only
        i = body.rindex(b"/Type /XRef")
        j = body.index(b"/Length ", i)
        k = body.index(b" >>", j)
        patched = body[:j] + b"/Length 5 0 R" + body[k:]
        assert parse_pdf(patched) is None

    def test_fixture_rotates_both_flavors(self):
        import pandas as pd  # noqa: F401
        from flycatcher_spark.operators.pdf import make_pdf_payload  # noqa: F401
        # pure-python check of the arm selection logic via encode_pdf:
        # odd ids are 1.5, even ids classic — both decode to the same
        # closed-form text
        for i in (4, 5):
            pages = [
                [f"Doc {i} page {p}", f"body {(i * 7 + p) % 97} (pdf)"]
                for p in range(1 + i % 3)
            ]
            body = encode_pdf(
                pages, compress=(i % 2 == 0), variant=i,
                xref_stream=(i % 2 == 1), objstm=(i % 8 in (1, 3)),
                xref_predictor=12 if i % 8 == 5 else None,
            )
            flavor = b"/Type /XRef" in body
            assert flavor == (i % 2 == 1)
            got = parse_pdf(body)["text"]
            assert got == "\n".join("\n".join(p) for p in pages)


class TestUnpredict:
    def _png_filter(self, rows, ft, bpp=1):
        # independent FORWARD filter per PNG spec; _unpredict must undo
        out = bytearray()
        prev = bytes(len(rows[0]))
        for row in rows:
            enc = bytearray()
            for j, x in enumerate(row):
                a = row[j - bpp] if j >= bpp else 0
                b = prev[j]
                c = prev[j - bpp] if j >= bpp else 0
                if ft == 0:
                    pred = 0
                elif ft == 1:
                    pred = a
                elif ft == 2:
                    pred = b
                elif ft == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                enc.append((x - pred) & 0xFF)
            out += bytes([ft]) + bytes(enc)
            prev = row
        return bytes(out)

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    def test_all_png_filters_inverted(self, ft):
        rows = [bytes([(r * 31 + c * 7) % 256 for c in range(6)])
                for r in range(5)]
        data = self._png_filter(rows, ft)
        got = _unpredict(data, {"/Predictor": 12, "/Columns": 6})
        assert got == b"".join(rows)

    def test_tiff_differencing_inverted(self):
        rows = [bytes([(r * 13 + c * 5) % 256 for c in range(4)])
                for r in range(3)]
        enc = bytearray()
        for row in rows:
            enc += bytes([row[0]] + [(row[j] - row[j - 1]) & 0xFF
                                     for j in range(1, 4)])
        got = _unpredict(bytes(enc), {"/Predictor": 2, "/Columns": 4})
        assert got == b"".join(rows)

    def test_bad_filter_type_raises(self):
        with pytest.raises(ValueError):
            _unpredict(b"\x09abcd", {"/Predictor": 12, "/Columns": 4})

    def test_none_predictor_passthrough(self):
        assert _unpredict(b"xyz", {"/Predictor": 1}) == b"xyz"


class TestCraftedHostility:
    """ADVICE r9: crafted/corrupt files must yield the documented
    null row, never crash the Spark task."""

    @staticmethod
    def _xref_stream_pdf(rows: list[bytes], size: int, root: int) -> bytes:
        """Minimal hand-built PDF 1.5 file: one xref STREAM at a known
        offset carrying ``rows`` (W = [1 4 2] entries)."""
        header = b"%PDF-1.5\n"
        data = zlib.compress(b"".join(rows))
        stm = (
            b"1 0 obj\n<< /Type /XRef /W [1 4 2] /Size %d /Root %d 0 R "
            b"/Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream\nendobj\n"
            % (size, root, len(data), data)
        )
        return (
            header + stm
            + b"startxref\n%d\n%%%%EOF\n" % len(header)
        )

    @staticmethod
    def _row(etype: int, f2: int, f3: int) -> bytes:
        return bytes([etype]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")

    def test_objstm_self_cycle_is_honest_none(self):
        # xref maps object 3 (the ObjStm container) to a type-2 entry
        # INSIDE ITSELF; resolving /Root (2 0 R, also inside ObjStm 3)
        # walks get -> _objstm_member -> get(3) -> _objstm_member ...
        # Unguarded this recurses to RecursionError and kills the task.
        body = self._xref_stream_pdf(
            [
                self._row(0, 0, 65535),
                self._row(1, 9, 0),      # obj 1 = the xref stream itself
                self._row(2, 3, 0),      # obj 2 lives in ObjStm 3
                self._row(2, 3, 1),      # obj 3 "lives in" ObjStm 3 (cycle!)
            ],
            size=4,
            root=2,
        )
        assert parse_pdf(body) is None

    def test_mutual_objstm_cycle_is_honest_none(self):
        # two ObjStms that each claim to contain the other
        body = self._xref_stream_pdf(
            [
                self._row(0, 0, 65535),
                self._row(1, 9, 0),
                self._row(2, 3, 0),      # root inside ObjStm 3
                self._row(2, 4, 0),      # ObjStm 3 inside ObjStm 4
                self._row(2, 3, 1),      # ObjStm 4 inside ObjStm 3
            ],
            size=5,
            root=2,
        )
        assert parse_pdf(body) is None

    def test_incremental_free_shadows_older_entry(self):
        # an object FREED by a newer incremental section must not be
        # resurrected from the older section (ISO 32000 §7.5.4: the
        # newest entry wins, in-use or free). Freeing the page's
        # content stream turns its text into "" (resolve -> None).
        base = encode_pdf([["hello world"]])
        assert parse_pdf(base)["text"] == "hello world"
        import re as _re

        # the content stream is the object whose body holds BT/ET
        m = _re.search(rb"(\d+) 0 obj\n<<[^>]*/Length[^>]*>>\nstream", base)
        content_num = int(m.group(1))
        old_start = int(base[base.rindex(b"startxref"):].split()[1])
        size = int(_re.search(rb"/Size (\d+)", base).group(1))
        root = int(_re.search(rb"/Root (\d+) 0 R", base).group(1))
        new_pos = len(base)
        body = base + (
            b"xref\n%d 1\n0000000000 00001 f \n"
            b"trailer\n<< /Size %d /Root %d 0 R /Prev %d >>\n"
            b"startxref\n%d\n%%%%EOF\n"
            % (content_num, size, root, old_start, new_pos)
        )
        m2 = parse_pdf(body)
        assert m2 is not None
        assert m2["n_pages"] == 1
        assert m2["text"] == ""  # freed, not resurrected

    def test_xref_stream_free_shadows_older_entry(self):
        # same shadowing rule through the PDF 1.5 flavor: a newer xref
        # STREAM section re-marks the content object as free (type 0)
        base = encode_pdf([["hello world"]], xref_stream=True)
        assert parse_pdf(base)["text"] == "hello world"
        import re as _re

        m = _re.search(
            rb"(\d+) 0 obj\n<< /Length \d+ >>\nstream\n.*?BT",
            base, _re.S,
        )
        content_num = int(m.group(1))
        old_start = int(base[base.rindex(b"startxref"):].split()[1])
        size = int(_re.search(rb"/Size (\d+)", base).group(1))
        root = int(_re.search(rb"/Root (\d+) 0 R", base).group(1))
        new_pos = len(base)
        data = zlib.compress(self._row(0, 0, 65535))
        patch = (
            b"90 0 obj\n<< /Type /XRef /W [1 4 2] /Size %d /Root %d 0 R "
            b"/Prev %d /Index [%d 1] /Filter /FlateDecode /Length %d >>\n"
            b"stream\n%s\nendstream\nendobj\n"
            % (size, root, old_start, content_num, len(data), data)
        )
        body = base + patch + b"startxref\n%d\n%%%%EOF\n" % new_pos
        m2 = parse_pdf(body)
        assert m2 is not None
        assert m2["text"] == ""
