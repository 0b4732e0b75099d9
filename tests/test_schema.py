"""Schema metaclass tests (reference pattern: tests/test_schema.py)."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import types as T

from flycatcher_spark import Field, Schema, col, model_validator
from flycatcher_spark.fields import Boolean, Date, Datetime, Float, Integer, String


class TestFieldCollection:
    def test_fields_collected_in_order(self):
        class S(Schema):
            a: int
            b: str
            c: float

        assert list(S.fields().keys()) == ["a", "b", "c"]

    def test_field_classes(self):
        class S(Schema):
            i: int
            f: float
            s: str
            b: bool
            dt: datetime
            d: date

        f = S.fields()
        assert isinstance(f["i"], Integer)
        assert isinstance(f["f"], Float)
        assert isinstance(f["s"], String)
        assert isinstance(f["b"], Boolean)
        assert isinstance(f["dt"], Datetime)
        assert isinstance(f["d"], Date)

    def test_names_assigned(self):
        class S(Schema):
            x: int

        assert S.fields()["x"].name == "x"

    def test_private_attrs_skipped(self):
        class S(Schema):
            x: int
            _private: str

        assert list(S.fields().keys()) == ["x"]

    def test_nullable_from_annotation(self):
        class S(Schema):
            a: int
            b: int | None = None

        assert not S.fields()["a"].nullable
        assert S.fields()["b"].nullable

    def test_raw_default(self):
        class S(Schema):
            n: str = "unknown"

        assert S.fields()["n"].default == "unknown"

    def test_unsupported_type_raises(self):
        with pytest.raises(TypeError, match="Unsupported type"):

            class S(Schema):
                x: bytes

    def test_complex_union_raises(self):
        with pytest.raises(TypeError, match="Union types other than"):

            class S(Schema):
                x: int | str

    def test_field_kwargs_filtered_per_type(self):
        # pattern applies to String only; silently dropped for Integer
        class S(Schema):
            n: int = Field(ge=1, pattern="abc")

        assert S.fields()["n"].ge == 1
        assert not hasattr(S.fields()["n"], "pattern")


class TestInheritance:
    """Upgrade over the reference: inheritance works (its TODO)."""

    def test_inherited_fields_collected(self):
        class Base(Schema):
            id: int = Field(primary_key=True)
            name: str

        class Child(Base):
            extra: float

        assert list(Child.fields().keys()) == ["id", "name", "extra"]
        assert Child.fields()["id"].primary_key

    def test_child_overrides_parent(self):
        class Base(Schema):
            x: int = Field(ge=0)

        class Child(Base):
            x: int = Field(ge=10)

        assert Child.fields()["x"].ge == 10
        assert Base.fields()["x"].ge == 0

    def test_inherited_validators(self):
        class Base(Schema):
            a: int

            @model_validator
            def check_a():
                return col("a") > 0

        class Child(Base):
            b: int

            @model_validator
            def check_b():
                return col("b") > 0

        assert len(Child.model_validators()) == 2
        assert len(Base.model_validators()) == 1


class TestModelValidators:
    def test_collected(self):
        class S(Schema):
            a: int

            @model_validator
            def v():
                return col("a") > 0

        assert len(S.model_validators()) == 1

    def test_classmethod_collected(self):
        class S(Schema):
            a: int

            @classmethod
            @model_validator
            def v(cls):
                return col("a") > 0

        assert len(S.model_validators()) == 1

    def test_plain_methods_not_collected(self):
        class S(Schema):
            a: int

            def not_a_validator(self):
                return True

        assert len(S.model_validators()) == 0


class TestSparkSchema:
    def test_struct_type_mapping(self):
        class S(Schema):
            i: int
            f: float
            s: str
            b: bool
            dt: datetime
            d: date
            opt: str | None = None

        st = S.to_spark_schema()
        assert st["i"].dataType == T.LongType()
        assert st["f"].dataType == T.DoubleType()
        assert st["s"].dataType == T.StringType()
        assert st["b"].dataType == T.BooleanType()
        assert st["dt"].dataType == T.TimestampNTZType()
        assert st["d"].dataType == T.DateType()
        assert not st["i"].nullable
        assert st["opt"].nullable

    def test_metadata_carried(self):
        class S(Schema):
            id: int = Field(primary_key=True, description="pk")
            email: str = Field(unique=True, max_length=100)

        st = S.to_spark_schema()
        assert st["id"].metadata["primary_key"] is True
        assert st["id"].metadata["description"] == "pk"
        assert st["email"].metadata["unique"] is True
        assert st["email"].metadata["max_length"] == 100

    def test_explicit_field_style_rejected(self):
        with pytest.raises(TypeError, match="Explicit field style"):

            class S(Schema):
                x: int = Integer()


class TestPackageSurface:
    """Root-export parity with the reference package.

    Reference ``src/flycatcher/__init__.py:14-26`` exports ``FieldRef``
    ("Internal (for advanced use)") and pins ``__version__ = "0.2.0"``.
    """

    def test_fieldref_importable_from_root(self):
        from flycatcher_spark import FieldRef

        ref = FieldRef("x")
        assert (ref > 1) is not None  # operator chain builds an AST node

    def test_version_matches_reference(self):
        import flycatcher_spark

        assert flycatcher_spark.__version__ == "0.2.0"
