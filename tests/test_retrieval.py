"""operators/retrieval — BM25 lexical top-k search."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flycatcher_spark import plans
from flycatcher_spark.operators import retrieval

DOCS = [
    (1, "red fish blue fish"),
    (2, "red truck"),
    (3, "blue blue sky"),
    (4, "fish truck fish truck fish truck"),
    (5, ""),
]


def _py_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Independent driver-side BM25 (written from the formula, not
    the operator): returns {doc_id: score rounded to 6}."""
    toks = {i: t.split() for i, t in docs if t.split()}
    n = float(len(docs))
    dl = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dl.values()) / float(len(dl))
    dfreq: dict[str, int] = {}
    for ts in toks.values():
        for term in set(ts):
            dfreq[term] = dfreq.get(term, 0) + 1
    out: dict[int, float] = {}
    for i, ts in toks.items():
        s = 0.0
        for term in set(query_terms):
            tf = ts.count(term)
            if tf == 0:
                continue
            idf = math.log(
                1.0 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5)
            )
            contrib = (
                idf
                * (tf * (k1 + 1.0))
                / (tf + k1 * (1.0 - b + b * (dl[i] / avgdl)))
            )
            s += round(contrib, 9)
        if s:
            out[i] = round(s, 6)
    return out


class TestBm25:
    def test_matches_independent_formula(self, spark):
        d = spark.createDataFrame(DOCS, ["doc_id", "text"])
        q = spark.createDataFrame(
            [(0, "blue fish"), (1, "truck"), (2, "red sky truck")],
            ["query_id", "query"],
        )
        got = {
            (r.query_id, r.doc_id): r.score
            for r in retrieval.bm25_topk(d, q, k=10).collect()
        }
        for qid, text in [(0, "blue fish"), (1, "truck"),
                          (2, "red sky truck")]:
            want = _py_bm25(DOCS, text.split())
            assert {d_: s for (q_, d_), s in got.items() if q_ == qid} == want

    def test_ranking_and_k(self, spark):
        d = spark.createDataFrame(DOCS, ["doc_id", "text"])
        q = spark.createDataFrame([(0, "fish")], ["query_id", "query"])
        rows = retrieval.bm25_topk(d, q, k=1).collect()
        assert len(rows) == 1 and rows[0]["rank"] == 1
        # doc 4 has tf=3 for 'fish' but is long; doc 1 tf=2 — verify
        # against the formula rather than intuition
        want = _py_bm25(DOCS, ["fish"])
        assert rows[0].doc_id == max(want, key=lambda i: (want[i], -i))

    def test_duplicate_query_terms_count_once(self, spark):
        d = spark.createDataFrame(DOCS, ["doc_id", "text"])
        q1 = spark.createDataFrame([(0, "fish")], ["query_id", "query"])
        q2 = spark.createDataFrame(
            [(0, "fish fish fish")], ["query_id", "query"]
        )
        a = {(r.doc_id, r.score)
             for r in retrieval.bm25_topk(d, q1, k=10).collect()}
        b = {(r.doc_id, r.score)
             for r in retrieval.bm25_topk(d, q2, k=10).collect()}
        assert a == b

    def test_empty_and_unmatched(self, spark):
        d = spark.createDataFrame(DOCS, ["doc_id", "text"])
        q = spark.createDataFrame(
            [(0, "zzz qqq"), (1, "")], ["query_id", "query"]
        )
        assert retrieval.bm25_topk(d, q, k=10).count() == 0

    def test_partitioning_invariance(self, spark):
        d = spark.createDataFrame(DOCS, ["doc_id", "text"])
        q = spark.createDataFrame([(0, "blue fish truck")],
                                  ["query_id", "query"])
        one = {(r.doc_id, r.score)
               for r in retrieval.bm25_topk(
                   d.coalesce(1), q, k=10).collect()}
        many = {(r.doc_id, r.score)
                for r in retrieval.bm25_topk(
                    d.repartition(7), q, k=10).collect()}
        assert one == many

    def test_query_set_broadcasts(self, spark):
        d = spark.createDataFrame(DOCS, ["doc_id", "text"])
        q = spark.createDataFrame([(0, "fish")], ["query_id", "query"])
        rep = plans.plan_report(retrieval.bm25_topk(d, q, k=5))
        assert rep.broadcast_hash_joins >= 1


class TestRrfFuse:
    def test_known_fusion(self, spark):
        a = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
            ["query_id", "doc_id", "rank"],
        )
        b = spark.createDataFrame(
            [(0, 11, 1), (0, 13, 2)], ["query_id", "doc_id", "rank"]
        )
        got = {
            r.doc_id: (r["rank"], r.rrf_score)
            for r in retrieval.rrf_fuse([a, b], k=10).collect()
        }
        # independent arithmetic
        want = {
            10: round(round(1 / 61.0, 9), 9),
            11: round(round(1 / 62.0, 9) + round(1 / 61.0, 9), 9),
            12: round(round(1 / 63.0, 9), 9),
            13: round(round(1 / 62.0, 9), 9),
        }
        assert {d: s for d, (_, s) in got.items()} == want
        # 11 appears in both lists -> fused rank 1
        assert got[11][0] == 1

    def test_three_systems_order_invariant(self, spark):
        rks = [
            spark.createDataFrame([(0, i, 1), (0, i + 1, 2)],
                                  ["query_id", "doc_id", "rank"])
            for i in (10, 11, 12)
        ]
        x = {(r.doc_id, r.rrf_score)
             for r in retrieval.rrf_fuse(rks, k=10).collect()}
        y = {(r.doc_id, r.rrf_score)
             for r in retrieval.rrf_fuse(rks[::-1], k=10).collect()}
        assert x == y

    def test_hybrid_composition(self, spark):
        # lexical and vector rankers over a corpus where the rankers
        # DISAGREE; fusion must prefer the doc both rank well
        from flycatcher_spark.operators import similarity

        docs = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha alpha beta"), (3, "gamma")],
            ["doc_id", "text"],
        )
        emb = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.8, 0.2]), (3, [0.9, 0.1]),
             (9, [1.0, 0.05])],
            "vec_id long, embedding array<double>",
        )
        q = spark.createDataFrame([(9, "alpha")], ["query_id", "query"])
        lex = retrieval.bm25_topk(
            docs, q, k=3
        ).select("query_id", "doc_id", "rank")
        vec = similarity.brute_force_topk(
            emb.where("vec_id < 9"), emb.where("vec_id = 9"), k=3
        ).select("query_id", F.col("vec_id").alias("doc_id"), "rank")
        fused = retrieval.rrf_fuse([lex, vec], k=3).collect()
        assert fused[0].query_id == 9
        # doc 1: lexically ranked (alpha beta) AND vector-near ->
        # must beat doc 3 (vector-only) and appear in top 2
        top2 = {r.doc_id for r in fused if r["rank"] <= 2}
        assert 1 in top2

    def test_empty_rankings_raise(self, spark):
        with pytest.raises(ValueError, match="at least one"):
            retrieval.rrf_fuse([])
