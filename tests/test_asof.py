"""Unit tests for the as-of join operator (semantics pinned to
DuckDB ASOF LEFT JOIN, which the query contract oracles against)."""

from __future__ import annotations

import pytest

from flycatcher_spark.operators import asof


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "c1"), (1, 25, "c2"), (1, 8, "c0"), (2, 5, "c3")],
        "k long, ts long, name string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100), (1, 20, 200), (1, 30, 300), (2, 50, 400)],
        "k long, ts long, val long",
    )
    return left, right


def _collect(df):
    return sorted(
        (r["k"], r["ts"], r["name"], r["val_right"], r["ts_right"])
        for r in df.collect()
    )


class TestAsofJoin:
    def test_backward_inclusive(self, spark, sides):
        left, right = sides
        got = _collect(asof.asof_join(left, right, on="k", ts_col="ts"))
        assert got == [
            (1, 8, "c0", 100, 8),     # exact tie matches (inclusive)
            (1, 10, "c1", 100, 8),
            (1, 25, "c2", 200, 20),   # 30 is in the future → 20 wins
            (2, 5, "c3", None, None),  # no prior purchase
        ]

    def test_inner_drops_unmatched(self, spark, sides):
        left, right = sides
        got = asof.asof_join(left, right, on="k", ts_col="ts", how="inner")
        assert all(r["ts_right"] is not None for r in got.collect())
        assert got.count() == 3

    def test_struct_carry_keeps_rows_consistent(self, spark):
        """A null in one right value column must not let another right
        row's value leak in — all attached columns come from the same
        matched row."""
        left = spark.createDataFrame([(1, 30, "x")], "k long, ts long, name string")
        right = spark.createDataFrame(
            [(1, 10, 111, "early"), (1, 20, None, "late")],
            "k long, ts long, a long, b string",
        )
        [row] = asof.asof_join(left, right, on="k", ts_col="ts").collect()
        # matched row is ts=20 whose a is null — a must NOT fall back to 111
        assert row["b_right"] == "late"
        assert row["a_right"] is None
        assert row["ts_right"] == 20

    def test_multi_key(self, spark):
        left = spark.createDataFrame(
            [(1, "x", 10), (1, "y", 10)], "k long, g string, ts long"
        )
        right = spark.createDataFrame(
            [(1, "x", 5, 1.0), (1, "y", 6, 2.0)], "k long, g string, ts long, v double"
        )
        got = {
            (r["k"], r["g"]): r["v_right"]
            for r in asof.asof_join(left, right, on=["k", "g"], ts_col="ts").collect()
        }
        assert got == {(1, "x"): 1.0, (1, "y"): 2.0}

    def test_plan_has_no_nested_loop(self, spark, sides):
        left, right = sides
        plan = (
            asof.asof_join(left, right, on="k", ts_col="ts")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan
        assert "Join" not in plan  # no join at all: union + window
