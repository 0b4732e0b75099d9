"""End-to-end SparkValidator pipeline tests.

Mirrors the reference's generator tests
(``/root/reference/tests/generators/test_polars.py``): strict raise /
non-strict filter behavior, null handling modes, default injection,
fill_nulls, schema coercion, and cross-field validators — plus this
engine's extensions (validate_lazy, flag_violations, check_unique).
"""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flycatcher_spark import Field, Schema, col, model_validator

from .conftest import ConstrainedSchema, DefaultsSchema, SimpleSchema


class TestBasicValidation:
    def test_valid_passes_strict(self, spark, valid_df):
        v = SimpleSchema.to_spark_validator()
        out = v.validate(valid_df, strict=True)
        assert out.count() == 3

    def test_output_schema_types(self, spark, valid_df):
        v = SimpleSchema.to_spark_validator()
        out = v.validate(valid_df)
        assert out.schema["id"].dataType == T.LongType()
        assert out.schema["name"].dataType == T.StringType()
        assert out.schema["age"].dataType == T.LongType()

    def test_missing_required_column_raises(self, spark):
        df = spark.createDataFrame([(1,)], ["id"])
        v = SimpleSchema.to_spark_validator()
        with pytest.raises(ValueError, match="Missing required columns"):
            v.validate(df)

    def test_extra_columns_dropped_and_order_normalized(self, spark):
        df = spark.createDataFrame(
            [("x", 25, "Alice", 1)], ["junk", "age", "name", "id"]
        )
        v = SimpleSchema.to_spark_validator()
        out = v.validate(df)
        assert out.columns == ["id", "name", "age"]

    def test_lossy_cast_becomes_null(self, spark):
        """Cast failures coerce to null, then null handling applies."""
        df = spark.createDataFrame(
            [("not-a-number", "Alice", "30")], ["id", "name", "age"]
        )
        v = SimpleSchema.to_spark_validator()
        # id is non-nullable; the failed cast null gets filtered
        out = v.validate(df, strict=False)
        assert out.count() == 0

    def test_numeric_string_casts(self, spark):
        df = spark.createDataFrame([("1", "Alice", "30")], ["id", "name", "age"])
        v = SimpleSchema.to_spark_validator()
        row = v.validate(df).collect()[0]
        assert row["id"] == 1 and row["age"] == 30


class TestNullHandling:
    def test_nullable_nulls_preserved(self, spark):
        df = spark.createDataFrame(
            [(1, "Alice", None)],
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("age", T.LongType(), True),
            ]),
        )
        v = SimpleSchema.to_spark_validator()
        out = v.validate(df, strict=True)
        assert out.collect()[0]["age"] is None

    def test_non_nullable_null_strict_raises(self, spark):
        df = spark.createDataFrame(
            [(1, None, 30), (2, "Bob", 31)],
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType(), True),
                T.StructField("age", T.LongType(), True),
            ]),
        )
        v = SimpleSchema.to_spark_validator()
        with pytest.raises(
            ValueError, match="Column 'name' has 1 null values but is not nullable"
        ):
            v.validate(df, strict=True)

    def test_non_nullable_null_nonstrict_filters(self, spark):
        df = spark.createDataFrame(
            [(1, None, 30), (2, "Bob", 31)],
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType(), True),
                T.StructField("age", T.LongType(), True),
            ]),
        )
        v = SimpleSchema.to_spark_validator()
        out = v.validate(df, strict=False)
        assert [r["name"] for r in out.collect()] == ["Bob"]


class TestDefaults:
    def test_missing_defaulted_columns_injected(self, spark):
        df = spark.createDataFrame([(1,), (2,)], ["id"])
        v = DefaultsSchema.to_spark_validator()
        out = v.validate(df)
        rows = out.orderBy("id").collect()
        assert out.columns == ["id", "name", "count", "is_active", "created_at"]
        assert rows[0]["name"] == "unknown"
        assert rows[0]["count"] == 0
        assert rows[0]["is_active"] is True
        assert rows[0]["created_at"] == datetime(2024, 1, 1)

    def test_fill_nulls(self, spark):
        df = spark.createDataFrame(
            [(1, None, None), (2, "Bob", 5)],
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType(), True),
                T.StructField("count", T.LongType(), True),
            ]),
        )
        v = DefaultsSchema.to_spark_validator()
        out = v.validate(df, fill_nulls=True)
        rows = out.orderBy("id").collect()
        assert rows[0]["name"] == "unknown"
        assert rows[0]["count"] == 0
        assert rows[1]["name"] == "Bob"
        assert rows[1]["count"] == 5

    def test_without_fill_nulls_non_nullable_default_field_filters(self, spark):
        df = spark.createDataFrame(
            [(1, None, None)],
            T.StructType([
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType(), True),
                T.StructField("count", T.LongType(), True),
            ]),
        )
        v = DefaultsSchema.to_spark_validator()
        out = v.validate(df, strict=False)
        assert out.count() == 0


class TestConstraints:
    def test_strict_first_violation_in_declaration_order(self, spark, constrained_invalid_df):
        v = ConstrainedSchema.to_spark_validator()
        with pytest.raises(ValueError) as exc:
            v.validate(constrained_invalid_df, strict=True)
        msg = str(exc.value)
        assert "Constraint violation: id must be >= 1" in msg
        assert "Found 1 violations" in msg
        assert "Sample violations" in msg

    def test_nonstrict_filters_all_violations(self, spark, constrained_invalid_df):
        v = ConstrainedSchema.to_spark_validator()
        out = v.validate(constrained_invalid_df, strict=False)
        assert [r["id"] for r in out.orderBy("id").collect()] == [4]

    def test_violation_diagnostics(self, spark, constrained_invalid_df):
        v = ConstrainedSchema.to_spark_validator()
        v.validate(constrained_invalid_df, strict=False)
        by_msg = {x["constraint"]: x["count"] for x in v.last_violations}
        assert by_msg == {
            "id must be >= 1": 1,
            "name must have at least 1 characters": 1,
            "age must be <= 120": 1,
        }

    def test_show_violations_collects_rows(self, spark, constrained_invalid_df):
        v = ConstrainedSchema.to_spark_validator()
        v.validate(constrained_invalid_df, strict=False, show_violations=True)
        assert all(x["rows"] is not None for x in v.last_violations)

    def test_valid_passes_constraints_strict(self, spark, constrained_valid_df):
        v = ConstrainedSchema.to_spark_validator()
        assert v.validate(constrained_valid_df, strict=True).count() == 2

    def test_describe_constraints(self):
        v = ConstrainedSchema.to_spark_validator()
        msgs = v.describe_constraints()
        assert "id must be >= 1" in msgs
        assert "name must have at least 1 characters" in msgs
        assert "name must have at most 100 characters" in msgs
        assert "age must be >= 0" in msgs
        assert "age must be <= 120" in msgs
        assert "price must be > 0.0" in msgs
        assert r"email must match pattern: ^[^@]+@[^@]+\.[^@]+$" in msgs

    def test_constraint_nulls_are_not_violations(self, spark):
        """Null predicate results: not counted, not filtered."""

        class S(Schema):
            x: float | None = Field(nullable=True, ge=0.0)

        df = spark.createDataFrame(
            [(None,), (1.0,)],
            T.StructType([T.StructField("x", T.DoubleType(), True)]),
        )
        v = S.to_spark_validator()
        out = v.validate(df, strict=False)
        # no true violations -> no filter applied -> null row survives
        assert out.count() == 2


class TestCrossFieldValidators:
    def test_tuple_format(self, spark):
        class DateRangeSchema(Schema):
            start_date: date
            end_date: date

            @model_validator
            def dates_ordered():
                return (col("end_date") > col("start_date"),
                        "end_date must be after start_date")

        good = (date(2024, 1, 1), date(2024, 1, 2))
        bad = (date(2024, 1, 2), date(2024, 1, 1))
        df = spark.createDataFrame([good, bad], ["start_date", "end_date"])
        v = DateRangeSchema.to_spark_validator()
        out = v.validate(df, strict=False)
        assert out.count() == 1
        with pytest.raises(ValueError, match="end_date must be after start_date"):
            v.validate(df, strict=True)

    def test_bare_expression_format(self, spark):
        class S(Schema):
            a: int

            @model_validator
            def positive():
                return col("a") > 0

        df = spark.createDataFrame([(1,), (-1,)], ["a"])
        v = S.to_spark_validator()
        with pytest.raises(ValueError, match="Validation failed"):
            v.validate(df, strict=True)

    def test_dict_format_with_raw_column(self, spark):
        class S(Schema):
            a: int

            @model_validator
            def via_dict():
                return {
                    "spark": (F.col("a") % 2 == 0, "a must be even"),
                    "pydantic": lambda m: m.a % 2 == 0,
                }

        df = spark.createDataFrame([(2,), (3,)], ["a"])
        v = S.to_spark_validator()
        out = v.validate(df, strict=False)
        assert [r["a"] for r in out.collect()] == [2]

    def test_classmethod_validator(self, spark):
        class S(Schema):
            a: int

            @classmethod
            @model_validator
            def check(cls):
                return (col("a") < 100, "too big")

        df = spark.createDataFrame([(5,), (500,)], ["a"])
        out = S.to_spark_validator().validate(df, strict=False)
        assert out.count() == 1

    def test_unevaluable_constraint_skipped(self, spark):
        """V7: analysis errors demote to warnings, not failures."""

        class S(Schema):
            a: int

            @model_validator
            def broken():
                return (col("nonexistent_column") > 0, "refers to missing col")

        df = spark.createDataFrame([(1,)], ["a"])
        out = S.to_spark_validator().validate(df, strict=True)
        assert out.count() == 1  # constraint skipped with a warning


class TestScaleFastPaths:
    def test_validate_lazy_same_rows_as_nonstrict(self, spark, constrained_invalid_df):
        v = ConstrainedSchema.to_spark_validator()
        eager = v.validate(constrained_invalid_df, strict=False)
        lazy = v.validate_lazy(constrained_invalid_df)
        assert sorted(r["id"] for r in eager.collect()) == sorted(
            r["id"] for r in lazy.collect()
        )

    def test_validate_lazy_runs_no_jobs(self, spark, constrained_valid_df):
        v = ConstrainedSchema.to_spark_validator()
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup() or [])
        v.validate_lazy(constrained_valid_df)  # no action triggered
        after = len(tracker.getJobIdsForGroup() or [])
        assert before == after

    def test_flag_violations(self, spark, constrained_invalid_df):
        v = ConstrainedSchema.to_spark_validator()
        flagged = v.flag_violations(constrained_invalid_df)
        assert flagged.count() == 4  # nothing dropped
        bad = flagged.filter(F.size("_violations") > 0)
        assert bad.count() == 3
        msgs = {
            m for r in bad.collect() for m in r["_violations"]
        }
        assert "id must be >= 1" in msgs
        assert "age must be <= 120" in msgs

    def test_check_unique(self, spark):
        class S(Schema):
            id: int = Field(primary_key=True)
            email: str = Field(unique=True)
            note: str

        df = spark.createDataFrame(
            [(1, "a@x.com", "n1"), (1, "b@x.com", "n2"), (3, "a@x.com", "n3")],
            ["id", "email", "note"],
        )
        dupes = S.to_spark_validator().check_unique(df)
        assert dupes == {"id": 1, "email": 1}


class TestPlanQuality:
    def test_validation_is_single_filter_over_scan(self, spark, tmp_path):
        """The lazy plan should be filter+project over the file scan —
        no shuffles, no extra stages — so Catalyst can push predicates
        into the parquet reader."""
        path = str(tmp_path / "li")
        spark.createDataFrame(
            [(1, "A", 10)], ["id", "name", "age"]
        ).write.parquet(path)
        df = spark.read.parquet(path)
        v = SimpleSchema.to_spark_validator()
        out = v.validate(df, strict=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # no shuffle in a validation scan
