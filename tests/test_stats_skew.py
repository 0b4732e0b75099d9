"""Tests for the profiling and skew-handling operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flycatcher_spark.operators import skew, stats


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 10.0, "a"),
        (2, 20.0, "b"),
        (3, None, "a"),
        (4, 40.0, None),
        (4, 40.0, None),  # duplicate id
    ]
    return spark.createDataFrame(rows, "id long, v double, k string")


class TestProfile:
    def test_exact_profile(self, spark, frame):
        prof = {r["column"]: r.asDict() for r in
                stats.profile_stats(frame, exact=True).collect()}
        assert prof["id"]["n"] == 5
        assert prof["id"]["n_null"] == 0
        assert prof["id"]["n_distinct"] == 4
        assert prof["id"]["min_str"] == "1" and prof["id"]["max_str"] == "4"
        assert prof["id"]["sum"] == 14.0
        assert prof["id"]["mean"] == pytest.approx(14 / 5)
        assert prof["v"]["n_null"] == 1
        assert prof["v"]["mean"] == pytest.approx(110 / 4)
        assert prof["k"]["n_distinct"] == 2
        assert prof["k"]["sum"] is None and prof["k"]["mean"] is None

    def test_approx_distinct_close(self, spark, frame):
        prof = {r["column"]: r["n_distinct"] for r in
                stats.profile_stats(frame).collect()}
        assert abs(prof["id"] - 4) <= 1  # HLL on 4 values is exact-ish

    def test_column_subset(self, spark, frame):
        prof = stats.profile_stats(frame, columns=["id"]).collect()
        assert [r["column"] for r in prof] == ["id"]

    def test_approx_quantiles(self, spark, frame):
        q = stats.approx_quantiles(frame, ["v"], [0.0, 1.0], relative_error=0.0)
        assert q["v"] == [10.0, 40.0]


class TestSkew:
    def test_salted_groupby_count_matches_plain(self, spark):
        rows = [("hot",)] * 500 + [("a",), ("b",)] * 10
        df = spark.createDataFrame(rows, "k string")
        got = {r["k"]: r["n"] for r in
               skew.salted_groupby_count(df, ["k"], salt_buckets=8).collect()}
        assert got == {"hot": 500, "a": 10, "b": 10}

    def test_salted_join_matches_plain_join(self, spark):
        big = spark.createDataFrame(
            [(i % 3, i) for i in range(300)], "k long, payload long"
        )
        small = spark.createDataFrame(
            [(0, "zero"), (1, "one"), (2, "two"), (9, "unused")],
            "k long, name string",
        )
        plain = big.join(small, "k").select("k", "payload", "name")
        salted = skew.salted_join(big, small, on="k", salt_buckets=4).select(
            "k", "payload", "name"
        )
        assert plain.count() == salted.count() == 300
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0

    def test_salted_join_spreads_hot_key(self, spark):
        big = spark.createDataFrame([(1, i) for i in range(100)], "k long, p long")
        salted = skew.with_salt(big, 8)
        n_salts = salted.select("__salt").distinct().count()
        assert n_salts > 1  # hot key occupies multiple salt buckets
