"""operators/graph — out-degrees and exact deterministic PageRank."""

from __future__ import annotations

from collections import defaultdict

import pytest

from flycatcher_spark.operators import graph


def _py_pagerank(edges, iterations=3, damping=0.85):
    """Driver-side replica of the documented arithmetic (round-9
    contributions, round-9 ranks, dangling mass dropped)."""
    edges = sorted(set(edges))
    nodes = sorted({x for t in edges for x in t})
    n = len(nodes)
    outd = defaultdict(int)
    for s, _ in edges:
        outd[s] += 1
    r = {v: round(1.0 / n, 9) for v in nodes}
    for _ in range(iterations):
        inc = defaultdict(float)
        for s, d in edges:
            inc[d] += round(r[s] / outd[s], 9)
        r = {
            v: round((1.0 - damping) / n + damping * round(inc.get(v, 0.0), 9), 9)
            for v in nodes
        }
    return r


EDGES = [
    ("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"), ("d", "a"),
    ("d", "b"), ("e", "a"), ("c", "e"),
]


class TestOutDegrees:
    def test_counts(self, spark):
        e = spark.createDataFrame(EDGES, ["src", "dst"])
        deg = {r.src: r.out_deg for r in graph.out_degrees(e).collect()}
        assert deg == {"a": 2, "b": 1, "c": 2, "d": 2, "e": 1}


class TestPagerank:
    def test_matches_python_reference(self, spark):
        e = spark.createDataFrame(EDGES, ["src", "dst"])
        got = {r.node: r.rank for r in graph.pagerank(e, iterations=3).collect()}
        want = _py_pagerank(EDGES, iterations=3)
        assert got == want  # exact — both sides use the same rounding

    def test_zero_iterations_is_uniform(self, spark):
        e = spark.createDataFrame(EDGES, ["src", "dst"])
        got = {r.node: r.rank for r in graph.pagerank(e, iterations=0).collect()}
        assert set(got.values()) == {round(1.0 / 5, 9)}

    def test_dangling_mass_dropped(self, spark):
        # b is dangling: total mass shrinks but stays positive,
        # ranks stay deterministic
        e = spark.createDataFrame([("a", "b")], ["src", "dst"])
        got = {r.node: r.rank for r in graph.pagerank(e, iterations=2).collect()}
        want = _py_pagerank([("a", "b")], iterations=2)
        assert got == want
        assert sum(got.values()) < 1.0

    def test_duplicate_edges_collapse(self, spark):
        e = spark.createDataFrame(
            EDGES + EDGES[:4], ["src", "dst"]
        )  # duplicates must not double-count contributions
        got = {r.node: r.rank for r in graph.pagerank(e, iterations=2).collect()}
        assert got == _py_pagerank(EDGES, iterations=2)

    def test_checkpointing_does_not_change_values(self, spark):
        e = spark.createDataFrame(EDGES, ["src", "dst"])
        plain = {
            r.node: r.rank
            for r in graph.pagerank(e, iterations=5, checkpoint_every=0).collect()
        }
        ckpt = {
            r.node: r.rank
            for r in graph.pagerank(e, iterations=5, checkpoint_every=2).collect()
        }
        assert plain == ckpt == _py_pagerank(EDGES, iterations=5)

    def test_well_linked_node_outranks_periphery(self, spark):
        e = spark.createDataFrame(EDGES, ["src", "dst"])
        got = {r.node: r.rank for r in graph.pagerank(e, iterations=4).collect()}
        assert got["a"] == max(got.values())
        assert got["d"] == min(got.values())  # nothing links to d

    def test_negative_iterations_raise(self, spark):
        e = spark.createDataFrame(EDGES, ["src", "dst"])
        with pytest.raises(ValueError):
            graph.pagerank(e, iterations=-1)
