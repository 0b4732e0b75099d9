"""flycatcher_spark.caching — lifetime of operator-internal persists.

The r4 bench corruption proved internal ``persist()`` handles that
outlive the operator call are a real hazard (cross-call cache reuse,
executor-storage pressure in long-lived sessions). These tests pin
the fix: every internal persist is tracked, and after a completed
operator call the user can drop ALL of its cached RDDs via
``caching.scope()`` / ``caching.release()`` — verified against the
JVM's own persistent-RDD registry, not our bookkeeping.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flycatcher_spark import caching
from flycatcher_spark.operators import dedup, similarity


def _n_cached(spark) -> int:
    """Cached RDDs as the JVM sees them (user-visible storage)."""
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def _docs(spark):
    rows = [(i, f"tok{i % 7} alpha beta gamma delta tok{i % 3} epsilon")
            for i in range(40)]
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestScope:
    def test_scope_releases_minhash_signature_cache(self, spark):
        spark.catalog.clearCache()
        caching.release()
        assert _n_cached(spark) == 0
        with caching.scope():
            pairs = dedup.minhash_lsh_pairs(
                _docs(spark), num_perm=16, bands=4, threshold=0.5
            )
            pairs.collect()  # evaluate while the signature cache lives
            assert _n_cached(spark) >= 1
        assert _n_cached(spark) == 0
        # nothing left registered either
        assert caching.tracked_count() == 0

    def test_scope_releases_on_exception(self, spark):
        spark.catalog.clearCache()
        caching.release()
        try:
            with caching.scope():
                dedup.minhash_lsh_pairs(
                    _docs(spark), num_perm=16, bands=4
                )  # eager signature materialization happened
                assert _n_cached(spark) >= 1
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert _n_cached(spark) == 0

    def test_nested_scopes_release_innermost_first(self, spark):
        spark.catalog.clearCache()
        caching.release()
        with caching.scope():
            dedup.minhash_lsh_pairs(_docs(spark), num_perm=16, bands=4)
            outer = _n_cached(spark)
            assert outer >= 1
            with caching.scope():
                em = spark.createDataFrame(
                    [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(30)],
                    "vec_id long, embedding array<double>",
                )
                similarity.lsh_bucketed_topk(
                    em, k=2, dim=3, n_bits=4, n_tables=2
                ).collect()
                assert _n_cached(spark) > outer
            # inner scope's candidate cache gone, outer's sig remains
            assert _n_cached(spark) == outer
        assert _n_cached(spark) == 0


class TestRelease:
    def test_release_drains_unscoped_handles(self, spark):
        spark.catalog.clearCache()
        caching.release()
        pairs = dedup.minhash_lsh_pairs(_docs(spark), num_perm=16, bands=4)
        pairs.collect()
        assert _n_cached(spark) >= 1
        assert caching.release() >= 1
        assert _n_cached(spark) == 0
        # released handles recompute correctly (no stale references)
        assert pairs.count() == pairs.count()

    def test_read_routed_cache_is_tracked(self, spark, tmp_path):
        from flycatcher_spark import Field, Schema
        from flycatcher_spark.generators import ddl

        class Doc(Schema):
            doc_id: int
            text: str

        src = tmp_path / "in.json"
        src.write_text('{"doc_id": 1, "text": "a"}\nnot json\n')
        spark.catalog.clearCache()
        caching.release()
        with caching.scope():
            good, quarantine = ddl.read_routed(
                spark, Doc, str(src), fmt="json"
            )
            assert good.count() == 1
            assert quarantine.count() == 1
            assert _n_cached(spark) >= 1
        assert _n_cached(spark) == 0
