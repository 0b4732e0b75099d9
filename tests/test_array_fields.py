"""Array-typed fields (§7 nested-type extension): list[T] annotations,
item-count / element-range constraints, the .arr DSL accessor's
Spark/Python parity, and the Pydantic bridge."""

from __future__ import annotations

import pydantic
import pytest

from flycatcher_spark import Field, Schema, col
from flycatcher_spark.fields import BoolArray, FloatArray, IntArray, StrArray


class VecSchema(Schema):
    id: int = Field(ge=0)
    vec: list[float] = Field(min_items=2, max_items=4, item_ge=-1.0, item_le=1.0)
    tags: list[str] | None = None


@pytest.fixture
def vec_df(spark):
    return spark.createDataFrame(
        [
            (1, [0.1, 0.2], ["a"]),
            (2, [0.5, -0.5, 0.9], None),
            (3, [0.1], ["b"]),  # too few items
            (4, [0.1, 0.2, 0.3, 0.4, 0.5], None),  # too many
            (5, [0.1, 5.0], None),  # element out of range
        ],
        "id long, vec array<double>, tags array<string>",
    )


class TestArrayFields:
    def test_field_classes_and_types(self):
        fields = VecSchema.fields()
        assert isinstance(fields["vec"], FloatArray)
        assert isinstance(fields["tags"], StrArray) and fields["tags"].nullable
        assert (
            VecSchema.to_spark_schema()["vec"].dataType.simpleString()
            == "array<double>"
        )
        assert "vec ARRAY<DOUBLE> NOT NULL" in VecSchema.to_ddl()

    def test_int_bool_arrays(self):
        class S(Schema):
            xs: list[int] = Field(item_ge=0)
            bs: list[bool]

        assert isinstance(S.fields()["xs"], IntArray)
        assert isinstance(S.fields()["bs"], BoolArray)
        assert (
            S.to_spark_schema()["xs"].dataType.simpleString() == "array<bigint>"
        )

    def test_validation_filters_violations(self, spark, vec_df):
        v = VecSchema.to_spark_validator()
        good = v.validate(vec_df, strict=False)
        assert sorted(r["id"] for r in good.collect()) == [1, 2]
        counts = {x["constraint"]: x["count"] for x in v.last_violations}
        assert counts["vec must have at least 2 items"] == 1
        assert counts["vec must have at most 4 items"] == 1
        assert counts["vec items must be <= 1.0"] == 1

    def test_strict_raises_in_declaration_order(self, spark, vec_df):
        v = VecSchema.to_spark_validator()
        with pytest.raises(ValueError, match="vec must have at least 2 items"):
            v.validate(vec_df, strict=True)

    def test_arr_accessor_parity(self, spark):
        """`.arr` nodes dual-compile: Spark and plain-Python agree."""
        exprs = {
            "len": col("xs").arr.len(),
            "mn": col("xs").arr.min(),
            "mx": col("xs").arr.max(),
        }
        rows = [
            {"xs": [3.0, 1.0, 2.0]},
            {"xs": []},
            {"xs": None},
            {"xs": [5.0, None]},
        ]
        df = spark.createDataFrame(
            [(r["xs"],) for r in rows], "xs array<double>"
        )
        got_spark = df.select(
            *[e.to_spark().alias(k) for k, e in exprs.items()]
        ).collect()
        for row, srow in zip(rows, got_spark):
            for k, e in exprs.items():
                assert e.to_python(row) == srow[k], (row, k)

    def test_pydantic_bridge_item_bounds(self):
        P = VecSchema.to_pydantic()
        assert P(id=1, vec=[0.0, 0.5], tags=None).id == 1
        with pytest.raises(pydantic.ValidationError):
            P(id=1, vec=[0.0], tags=None)  # too few
        with pytest.raises(pydantic.ValidationError):
            P(id=1, vec=[0.0, 2.0], tags=None)  # item out of range

    def test_unsupported_list_type_rejected(self):
        with pytest.raises(TypeError, match="Unsupported type"):

            class Bad(Schema):
                xs: list[bytes]


class PropsSchema(Schema):
    id: int = Field(ge=0)
    props: dict[str, int] = Field(min_items=1, required_keys=["k"], item_ge=0)
    labels: dict[str, str] | None = None


class TestMapFields:
    def test_field_classes_and_types(self):
        from flycatcher_spark.fields import IntMap, StrMap

        fields = PropsSchema.fields()
        assert isinstance(fields["props"], IntMap)
        assert isinstance(fields["labels"], StrMap) and fields["labels"].nullable
        assert (
            PropsSchema.to_spark_schema()["props"].dataType.simpleString()
            == "map<string,bigint>"
        )
        assert "props MAP<STRING,BIGINT> NOT NULL" in PropsSchema.to_ddl()

    def test_validation_filters_violations(self, spark):
        df = spark.createDataFrame(
            [
                (1, {"k": 5}, None),
                (2, {}, None),          # empty (also missing k)
                (3, {"j": 1}, None),    # wrong key
                (4, {"k": -2}, None),   # negative value
                (5, {"k": 0, "x": 9}, {"a": "b"}),
            ],
            "id long, props map<string,bigint>, labels map<string,string>",
        )
        v = PropsSchema.to_spark_validator()
        good = v.validate(df, strict=False)
        assert sorted(r["id"] for r in good.collect()) == [1, 5]
        counts = {x["constraint"]: x["count"] for x in v.last_violations}
        assert counts["props must have at least 1 entries"] == 1
        assert counts["props must contain key 'k'"] == 2  # empty + wrong-key
        assert counts["props values must be >= 0"] == 1

    def test_map_accessor_parity(self, spark):
        from flycatcher_spark import col

        exprs = {
            "n": col("m").map.len(),
            "has": col("m").map.has_key("k"),
            "mn": col("m").map.min(),
            "mx": col("m").map.max(),
        }
        rows = [
            {"m": {"k": 3, "j": 7}},
            {"m": {}},
            {"m": None},
        ]
        df = spark.createDataFrame(
            [(r["m"],) for r in rows], "m map<string,bigint>"
        )
        got = df.select(
            *[e.to_spark().alias(k) for k, e in exprs.items()]
        ).collect()
        for row, srow in zip(rows, got):
            for k, e in exprs.items():
                assert e.to_python(row) == srow[k], (row, k)

    def test_pydantic_bridge(self):
        import pydantic

        P = PropsSchema.to_pydantic()
        assert P(id=1, props={"k": 5}, labels=None).props == {"k": 5}
        for bad in (
            dict(id=1, props={}, labels=None),
            dict(id=1, props={"j": 1}, labels=None),
            dict(id=1, props={"k": -1}, labels=None),
        ):
            with pytest.raises(pydantic.ValidationError):
                P(**bad)
