"""Corpus release diff (operators/versioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flycatcher_spark.operators import versioning

SCHEMA = "doc_id long, text string, lang string"


def test_diff_classifies_all_statuses(spark):
    old = spark.createDataFrame(
        [
            (1, "alpha", "en"),
            (2, "bravo", "en"),
            (3, "charlie", "de"),
            (4, "delta", "fr"),
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            (2, "bravo", "en"),       # unchanged
            (3, "charlie EDIT", "de"),  # changed text
            (4, "delta", "de"),        # changed lang only
            (5, "echo", "en"),         # added
        ],
        SCHEMA,
    )
    diff = versioning.corpus_diff(old, new, content_cols=("text", "lang"))
    got = {r["doc_id"]: r["status"] for r in diff.collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "changed",
        5: "added",
    }
    # fingerprints present exactly where the side exists
    rows = {r["doc_id"]: r for r in diff.collect()}
    assert rows[1]["new_fp"] is None and rows[1]["old_fp"] is not None
    assert rows[5]["old_fp"] is None and rows[5]["new_fp"] is not None


def test_diff_null_content_is_stable(spark):
    """Null content must fingerprint deterministically (coalesce to
    empty), so null == null is 'unchanged', and null != value."""
    old = spark.createDataFrame([(1, None, "en"), (2, None, "en")], SCHEMA)
    new = spark.createDataFrame([(1, None, "en"), (2, "now set", "en")], SCHEMA)
    got = {
        r["doc_id"]: r["status"]
        for r in versioning.corpus_diff(
            old, new, content_cols=("text", "lang")
        ).collect()
    }
    assert got == {1: "unchanged", 2: "changed"}


def test_diff_summary_counts(spark):
    old = spark.createDataFrame([(1, "a", "en"), (2, "b", "en")], SCHEMA)
    new = spark.createDataFrame([(2, "B", "en"), (3, "c", "en")], SCHEMA)
    diff = versioning.corpus_diff(old, new)
    got = {
        r["status"]: r["n"] for r in versioning.diff_summary(diff).collect()
    }
    assert got == {"added": 1, "removed": 1, "changed": 1}


def test_diff_only_shuffles_slim_columns(spark):
    """Scale invariant: each join input is a Project down to
    (id, md5 fp) directly over the source — the document bodies are
    fingerprinted map-side and never enter the join."""
    old = spark.createDataFrame([(1, "a" * 1000, "en")], SCHEMA)
    new = spark.createDataFrame([(1, "a" * 1000, "en")], SCHEMA)
    diff = versioning.corpus_diff(old, new)
    optimized = diff._jdf.queryExecution().optimizedPlan().toString()
    join_part = optimized.split("Join FullOuter")[1]
    # both join children project exactly (doc_id, md5(...) AS fp)
    assert join_part.count("md5(") == 2
    # the join's output attribute list (first line of each child
    # Project) carries no raw text/lang attribute
    for child in join_part.splitlines():
        if child.strip().startswith((":- Project", "+- Project")):
            assert "md5" in child and "lang#" not in child.split("AS")[0]


def test_fingerprint_engine_portable(spark):
    """The md5 fingerprint must match DuckDB's md5 over the same
    separator-joined content — release manifests from other engines
    agree byte-for-byte."""
    import duckdb

    df = spark.createDataFrame([(1, "hello", "en")], SCHEMA)
    [spark_fp] = df.select(
        versioning.content_fingerprint(["text", "lang"]).alias("fp")
    ).collect()
    [duck_fp] = duckdb.sql(
        "SELECT md5(concat_ws(chr(31), 'hello', 'en'))"
    ).fetchone()
    assert spark_fp["fp"] == duck_fp


class TestSchemaDrift:
    def test_all_statuses(self, spark):
        from flycatcher_spark.operators import versioning

        old = spark.createDataFrame(
            [(1, "a", 1.0, 7)], "id long, kept string, gone double, retyped long"
        )
        new = spark.createDataFrame(
            [(1, "a", "x", 2)], "id long, kept string, retyped string, fresh long"
        )
        got = {r["column"]: (r["status"], r["dtype_old"], r["dtype_new"])
               for r in versioning.schema_drift(old, new).collect()}
        assert got["id"] == ("unchanged", "bigint", "bigint")
        assert got["kept"] == ("unchanged", "string", "string")
        assert got["gone"] == ("removed", "double", None)
        assert got["retyped"] == ("type_changed", "bigint", "string")
        assert got["fresh"] == ("added", None, "bigint")

    def test_zero_jobs(self, spark):
        # pure metadata: no Spark job may run
        from flycatcher_spark.operators import versioning

        old = spark.createDataFrame([(1,)], "id long")
        tracker = spark.sparkContext.statusTracker()
        before = tracker.getJobIdsForGroup(None)
        versioning.schema_drift(old, old)  # construction only
        assert tracker.getJobIdsForGroup(None) == before


class TestProfileDrift:
    def test_planted_drift(self, spark):
        from flycatcher_spark.operators import versioning
        from pyspark.sql import functions as F

        old = spark.createDataFrame(
            [(i, i % 10) for i in range(100)], "id long, v long"
        )
        new = old.where("id < 80").withColumn(
            "v", F.when(F.col("id") % 4 == 0, None).otherwise(F.col("v"))
        )
        got = {r["column"]: r for r in
               versioning.profile_drift(old, new, ["id", "v"]).collect()}
        assert got["id"]["n_old"] == 100 and got["id"]["n_new"] == 80
        assert got["id"]["null_frac_delta"] == 0.0
        assert got["v"]["null_frac_old"] == 0.0
        assert got["v"]["null_frac_new"] == 0.25
        assert got["v"]["null_frac_delta"] == 0.25
        assert got["id"]["ndv_old"] == 100 and got["id"]["ndv_new"] == 80
        # mean of id: 49.5 -> 39.5
        assert got["id"]["mean_old"] == 49.5 and got["id"]["mean_new"] == 39.5
        assert got["id"]["mean_delta"] == -10.0

    def test_non_numeric_mean_is_null(self, spark):
        from flycatcher_spark.operators import versioning

        old = spark.createDataFrame([("a",), ("b",)], "s string")
        r = versioning.profile_drift(old, old, ["s"]).collect()[0]
        assert r["mean_old"] is None and r["mean_delta"] is None
        assert r["null_frac_delta"] == 0.0
