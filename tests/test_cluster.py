"""operators/cluster — exact deterministic Lloyd's k-means.

Pins the engine-portability contract the kmeans_clusters /
kmeans_semantic_dedup oracle queries rely on: deterministic init,
argmin tie-breaks, DECIMAL-mean partitioning invariance, the
empty-cluster rule, and agreement with a NumPy reference Lloyd's.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flycatcher_spark.operators import cluster


def _vecs(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_fit_known_answer(spark):
    # two tight groups: one round lands each centroid on its group mean
    df = _vecs(
        spark,
        [(1, [0.0, 0.0]), (2, [0.0, 0.2]), (3, [4.0, 4.0]), (4, [4.0, 4.2])],
    )
    cents = cluster.kmeans_fit(df, k=2, init_ids=[1, 3], n_iter=1)
    assert cents == [[0.0, 0.1], [4.0, 4.1]]


def test_default_init_is_k_smallest_ids(spark):
    df = _vecs(spark, [(5, [5.0]), (1, [1.0]), (3, [3.0])])
    cents = cluster.kmeans_fit(df, k=2, n_iter=0)
    assert cents == [[1.0], [3.0]]


def test_assign_tie_breaks_to_lower_cluster(spark):
    # equidistant from both centroids -> cluster 0 wins
    df = _vecs(spark, [(1, [1.0, 0.0])])
    out = cluster.kmeans_assign(df, [[0.0, 0.0], [2.0, 0.0]]).collect()
    assert out[0]["cluster"] == 0
    assert out[0]["dist"] == 1.0


def test_empty_cluster_keeps_previous_centroid(spark):
    # centroid 1 initialized far from every point: nothing assigns to
    # it, so the update must carry it through unchanged
    df = _vecs(spark, [(1, [0.0]), (2, [1.0])])
    cents = cluster.kmeans_fit(df, k=2, init_ids=[1, 2], n_iter=1)
    far = cluster.kmeans_assign(df, [[0.5], [100.0]])
    assert far.where(F.col("cluster") == 1).count() == 0
    cents2 = cluster._mean_update(
        cluster._with_assignment(df, "embedding", [[0.5], [100.0]]),
        "embedding",
        [[0.5], [100.0]],
    )
    assert cents2[1] == [100.0]
    assert cents2[0] == [0.5]
    assert cents == [[0.0], [1.0]]  # each point is its own centroid


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(60)]
    df1 = _vecs(spark, rows).coalesce(1)
    df2 = _vecs(spark, rows).repartition(13)
    c1 = cluster.kmeans_fit(df1, k=4, n_iter=3)
    c2 = cluster.kmeans_fit(df2, k=4, n_iter=3)
    assert c1 == c2  # DECIMAL-summed means: bitwise identical


def test_matches_numpy_lloyds(spark):
    """Full fit+assign == a NumPy reference Lloyd's with the same
    init, rounding points, and tie-break."""
    rng = np.random.default_rng(7)
    X = rng.normal(size=(50, 4))
    rows = [(i, [float(x) for x in X[i]]) for i in range(50)]
    k, n_iter = 3, 2

    cents = X[:k].copy()  # init is the raw vectors, unrounded
    for _ in range(n_iter + 1):  # last pass: assignment only
        d = np.round(
            np.maximum(
                (X * X).sum(1)[:, None]
                - 2 * X @ cents.T
                + (cents * cents).sum(1)[None, :],
                0.0,
            ),
            6,
        )
        assign = d.argmin(1)  # argmin takes the first (lowest) index
        new = cents.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                new[c] = np.round(np.round(X[m], 9).mean(0), 9)
        cents = new

    out = cluster.kmeans(_vecs(spark, rows), k=k, n_iter=n_iter)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert got == {i: int(assign[i]) for i in range(50)}


def test_assignment_is_map_only(spark):
    """The assign stage must not shuffle the corpus: no Exchange in
    the executed plan."""
    df = _vecs(spark, [(i, [float(i), 0.0]) for i in range(10)])
    out = cluster.kmeans_assign(df, [[0.0, 0.0], [5.0, 0.0]])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_init_validation(spark):
    df = _vecs(spark, [(1, [0.0]), (2, [1.0])])
    with pytest.raises(ValueError, match="length k"):
        cluster.kmeans_fit(df, k=2, init_ids=[1])
    with pytest.raises(ValueError, match="not found"):
        cluster.kmeans_fit(df, k=2, init_ids=[1, 99])
    with pytest.raises(ValueError, match="fewer than k"):
        cluster.kmeans_fit(df, k=5)
    with pytest.raises(ValueError, match="non-empty"):
        cluster.kmeans_assign(df, [])
