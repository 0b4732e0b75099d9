"""Property-based tests for the round-4 curation operators.

Each property is checked against a plain-Python reference computed on
the generated inputs (the model-based pattern of the decontamination
property tests): budget_mix must keep exactly the md5-ordered prefix
that fits each stratum's budget; leakage_safe_split must assign every
connected component to one side, matching a union-find reference;
ccnet_buckets must partition the corpus into surprise-ordered thirds.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flycatcher_spark.operators import quality

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# budget_mix
# ---------------------------------------------------------------------------
@st.composite
def budget_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    rows = []
    for i in range(n):
        src = draw(st.sampled_from(["a", "b", "c"]))
        tc = draw(st.integers(min_value=0, max_value=40))
        rows.append((i, src, tc))
    budget = draw(st.integers(min_value=0, max_value=120))
    return rows, budget


def _budget_reference(rows, budget, seed="budget0"):
    """Plain-Python model: per source, md5(seed:id) order, keep the
    prefix whose inclusive cumsum fits the budget (zero-token docs
    occupy no budget but still order deterministically)."""
    keep = {}
    by_src: dict[str, list] = {}
    for i, src, tc in rows:
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        by_src.setdefault(src, []).append((h, i, tc))
    for src, items in by_src.items():
        cum = 0
        for h, i, tc in sorted(items):
            cum += tc
            if cum <= budget:
                keep[i] = cum
    return keep


@given(budget_corpus())
@settings(**_SETTINGS)
def test_budget_mix_matches_python_reference(spark, case):
    rows, budget = case
    df = spark.createDataFrame(rows, "doc_id long, src string, tc long")
    got = {
        r["doc_id"]: r["cum_tokens"]
        for r in quality.budget_mix(
            df, "src", "doc_id", F.col("tc"), default_budget=budget
        ).collect()
    }
    assert got == _budget_reference(rows, budget)


# ---------------------------------------------------------------------------
# leakage_safe_split
# ---------------------------------------------------------------------------
@st.composite
def split_graph(draw):
    n = draw(st.integers(min_value=2, max_value=20))
    n_edges = draw(st.integers(min_value=0, max_value=15))
    edges = [
        tuple(
            sorted(
                draw(
                    st.tuples(
                        st.integers(0, n - 1), st.integers(0, n - 1)
                    ).filter(lambda t: t[0] != t[1])
                )
            )
        )
        for _ in range(n_edges)
    ]
    return n, sorted(set(edges))


def _components_reference(n, edges):
    """Union-find min-label components; singletons are their own."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n)}


@given(split_graph())
@settings(**_SETTINGS)
def test_leakage_split_components_and_sides(spark, case):
    n, edges = case
    docs = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
    pairs = spark.createDataFrame(
        edges or [], "doc_id_a long, doc_id_b long"
    )
    out = {
        r["doc_id"]: (r["component"], r["split"])
        for r in quality.leakage_safe_split(docs, pairs).collect()
    }
    ref = _components_reference(n, edges)
    assert {i: out[i][0] for i in range(n)} == ref
    # the leakage property itself: every edge's endpoints share a side
    for a, b in edges:
        assert out[a][1] == out[b][1]
    # split is a pure function of the component
    by_comp = {}
    for i in range(n):
        comp, side = out[i]
        assert by_comp.setdefault(comp, side) == side


# ---------------------------------------------------------------------------
# ccnet_buckets
# ---------------------------------------------------------------------------
@given(st.integers(min_value=4, max_value=20), st.integers(0, 10_000))
@settings(**_SETTINGS)
def test_ccnet_buckets_partition_and_order(spark, n, seed_off):
    # doc i: 3 common tokens + i distinct OOV tokens -> surprise is
    # strictly increasing in i (all OOV cost the same, common is cheap)
    rows = [
        (
            i,
            "tok tok tok "
            + " ".join(f"w{seed_off}x{i}y{j}" for j in range(i)),
        )
        for i in range(1, n + 1)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality.ccnet_buckets(docs, vocab_size=1).collect()
    assert len(out) == n
    by_bucket = {"head": [], "middle": [], "tail": []}
    for r in out:
        by_bucket[r["bucket"]].append(r["surprise"])
    # buckets are contiguous in surprise order
    if by_bucket["head"] and by_bucket["middle"]:
        assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    if by_bucket["middle"] and by_bucket["tail"]:
        assert max(by_bucket["middle"]) <= min(by_bucket["tail"])
    # thirds within one doc of each other (interpolated cuts)
    sizes = sorted(len(v) for v in by_bucket.values())
    assert sizes[-1] - sizes[0] <= 2


# ---------------------------------------------------------------------------
# quality_funnel (r11)
# ---------------------------------------------------------------------------
@st.composite
def funnel_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = [
        (
            i,
            draw(st.one_of(st.none(), st.integers(min_value=-20, max_value=20))),
            draw(st.integers(min_value=0, max_value=10)),
        )
        for i in range(n)
    ]
    t1 = draw(st.integers(min_value=-10, max_value=10))
    t2 = draw(st.integers(min_value=0, max_value=10))
    return rows, t1, t2


def _funnel_reference(rows, t1, t2):
    """Plain-Python model: charge each row to its first failing gate
    (None fails like SQL null), then fold the funnel table."""
    removed = {"g1": 0, "g2": 0}
    kept = 0
    for _i, x, y in rows:
        if not (x is not None and x >= t1):
            removed["g1"] += 1
        elif not (y >= t2):
            removed["g2"] += 1
        else:
            kept += 1
    total = len(rows)
    n_in1 = total
    n_out1 = n_in1 - removed["g1"]
    n_out2 = n_out1 - removed["g2"]
    return [
        (0, "g1", n_in1, removed["g1"], n_out1),
        (1, "g2", n_out1, removed["g2"], n_out2),
    ]


@given(case=funnel_corpus())
@settings(**_SETTINGS)
def test_quality_funnel_matches_python_reference(spark, case):
    rows, t1, t2 = case
    df = spark.createDataFrame(rows, "doc_id long, x long, y long")
    out = quality.quality_funnel(
        df, [("g1", F.col("x") >= t1), ("g2", F.col("y") >= t2)]
    )
    got = [
        (r["stage_idx"], r["stage"], r["n_in"], r["n_removed"], r["n_out"])
        for r in out.orderBy("stage_idx").collect()
    ]
    assert got == _funnel_reference(rows, t1, t2)


# ---------------------------------------------------------------------------
# weighted_sample (r11)
# ---------------------------------------------------------------------------
@st.composite
def weighted_corpus(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = [
        (i, draw(st.integers(min_value=0, max_value=10_000)))
        for i in range(n)
    ]
    k = draw(st.integers(min_value=1, max_value=n))
    return rows, k


def _weighted_reference(rows, k, resolution=1_000_000, scale=1_000_000_000):
    """Plain-Python model of the integer priority-sampling rule."""
    pr = []
    for i, w in rows:
        bucket = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % resolution
        pr.append((-(w * scale // (bucket + 1)), i))
    return [i for _p, i in sorted(pr)[:k]]


@given(case=weighted_corpus())
@settings(**_SETTINGS)
def test_weighted_sample_matches_python_reference(spark, case):
    rows, k = case
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = quality.weighted_sample(df.repartition(5), "w", "doc_id", k=k)
    got = [r["doc_id"] for r in out.collect()]
    assert got == _weighted_reference(rows, k)
