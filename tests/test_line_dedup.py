"""operators/dedup.line_dedup — cross-document duplicated-line
removal (the FineWeb / RefinedWeb boilerplate-line stage)."""

from __future__ import annotations

from flycatcher_spark.operators import dedup


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.line_dedup(df, **kw).orderBy("doc_id").collect()
    return {r.doc_id: (r.text_dedup, r.n_lines, r.n_removed) for r in out}


class TestLineDedup:
    def test_shared_line_removed_everywhere(self, spark):
        got = _run(
            spark,
            [(1, "unique one\nSHARED FOOTER"), (2, "unique two\nSHARED FOOTER")],
        )
        assert got == {
            1: ("unique one", 2, 1),
            2: ("unique two", 2, 1),
        }

    def test_normalization_merges_variants(self, spark):
        # case + whitespace variants of the same line count together
        got = _run(
            spark,
            [(1, "keep\n  Shared   Footer "), (2, "other\nshared footer")],
        )
        assert got[1][2] == 1 and got[2][2] == 1

    def test_normalize_false_is_verbatim(self, spark):
        got = _run(
            spark,
            [(1, "keep\nShared Footer"), (2, "other\nshared footer")],
            normalize=False,
        )
        assert got[1][2] == 0 and got[2][2] == 0

    def test_within_doc_repeat_is_not_cross_doc(self, spark):
        # the same line twice in ONE doc: count(DISTINCT doc) = 1
        got = _run(spark, [(1, "echo\necho"), (2, "different")])
        assert got[1] == ("echo\necho", 2, 0)

    def test_blank_lines_exempt(self, spark):
        got = _run(spark, [(1, "a\n\nb"), (2, "c\n\nd")])
        assert got[1] == ("a\n\nb", 3, 0)

    def test_min_chars_exempts_short_lines(self, spark):
        got = _run(spark, [(1, "ok\nlong shared line"), (2, "ok\nlong shared line")],
                   min_chars=5)
        # "ok" is below min_chars -> kept; the long line is removed
        assert got[1] == ("ok", 2, 1)

    def test_min_docs_threshold(self, spark):
        rows = [(1, "x\ncommon"), (2, "y\ncommon"), (3, "z\ncommon")]
        assert _run(spark, rows, min_docs=4)[1][2] == 0
        assert _run(spark, rows, min_docs=3)[1][2] == 1

    def test_fully_boilerplate_doc_becomes_empty(self, spark):
        got = _run(spark, [(1, "same"), (2, "same"), (3, "same\nextra")])
        assert got[1] == ("", 1, 1)
        assert got[3] == ("extra", 2, 1)

    def test_order_preserved_after_removal(self, spark):
        got = _run(
            spark,
            [(1, "first\nDUP\nsecond\nDUP\nthird"), (2, "DUP")],
        )
        assert got[1][0] == "first\nsecond\nthird"
        assert got[1][2] == 2

    def test_null_text_keeps_row(self, spark):
        df = spark.createDataFrame(
            [(1, "a\nB"), (2, None), (3, "a\nc")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.text_dedup, r.n_lines, r.n_removed)
            for r in dedup.line_dedup(df).collect()
        }
        assert got[2] == (None, 0, 0)
        assert got[1] == ("B", 2, 1)  # "a" shared with doc 3
