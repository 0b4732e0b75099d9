"""Property-based tests for the r5 operators (model-based pattern of
test_curation_properties): corpus_diff against a plain-dict reference
on randomly generated release pairs, and rerank_exact against a
numpy brute-force reference on random candidate sets.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from flycatcher_spark.operators import similarity, versioning

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# corpus_diff: random release pairs vs a dict reference
# ---------------------------------------------------------------------------
@st.composite
def release_pair(draw):
    ids = draw(
        st.lists(st.integers(0, 30), min_size=1, max_size=20, unique=True)
    )
    texts = st.sampled_from(["alpha", "beta", "gamma", ""])
    old = {i: draw(texts) for i in ids if draw(st.booleans())}
    new = {i: draw(texts) for i in ids if draw(st.booleans())}
    return old, new


def _diff_reference(old: dict, new: dict) -> dict:
    out = {}
    for i in set(old) | set(new):
        if i not in old:
            out[i] = "added"
        elif i not in new:
            out[i] = "removed"
        elif old[i] != new[i]:
            out[i] = "changed"
        else:
            out[i] = "unchanged"
    return out


@given(release_pair())
@settings(**_SETTINGS)
def test_corpus_diff_matches_dict_reference(spark, pair):
    old, new = pair
    if not old and not new:
        return
    schema = "doc_id long, text string"
    old_df = spark.createDataFrame(list(old.items()) or [(None, None)], schema)
    new_df = spark.createDataFrame(list(new.items()) or [(None, None)], schema)
    if not old:
        old_df = old_df.where("doc_id is not null")
    if not new:
        new_df = new_df.where("doc_id is not null")
    got = {
        r["doc_id"]: r["status"]
        for r in versioning.corpus_diff(old_df, new_df).collect()
    }
    assert got == _diff_reference(old, new)


# ---------------------------------------------------------------------------
# rerank_exact: any candidate superset of the true top-k reproduces
# the numpy brute-force answer exactly
# ---------------------------------------------------------------------------
@st.composite
def vector_corpus(draw):
    n = draw(st.integers(min_value=4, max_value=12))
    dim = draw(st.sampled_from([2, 3]))
    vals = st.integers(min_value=-3, max_value=3)
    vecs = []
    for i in range(n):
        v = [float(draw(vals)) for _ in range(dim)]
        if not any(v):
            v[0] = 1.0  # keep vectors non-zero so cosine is defined
        vecs.append((i, v))
    k = draw(st.integers(min_value=1, max_value=3))
    return vecs, k


def _np_topk(vecs, qid, k):
    V = {i: np.asarray(v) for i, v in vecs}
    q = V[qid]
    sims = []
    for i, v in V.items():
        if i == qid:
            continue
        s = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        sims.append((round(s, 6), i))
    sims.sort(key=lambda t: (-t[0], t[1]))
    return [i for _, i in sims[:k]]


@given(vector_corpus())
@settings(**_SETTINGS)
def test_rerank_full_candidates_equals_numpy_reference(spark, corpus_k):
    vecs, k = corpus_k
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    qid = vecs[0][0]
    q = df.where(f"vec_id = {qid}")
    # candidate set = EVERYTHING (trivially a superset of true top-k)
    cand = df.where(f"vec_id != {qid}").selectExpr(
        f"cast({qid} as long) as query_id", "vec_id"
    )
    got = [
        r["vec_id"]
        for r in similarity.rerank_exact(cand, df, q, k=k)
        .orderBy("rank")
        .collect()
    ]
    assert got == _np_topk(vecs, qid, k)
