"""Array- and map-typed fields: validating nested columns.

§7 nested-type extension (the reference DSL is scalar-only):
``list[T]`` and ``dict[str, T]`` annotations with item-count,
element/value-range, and required-key constraints — compiled to
``size``/``array_min``/``array_max``/``map_contains_key`` (codegen'd,
no higher-order lambdas), mirrored into Pydantic for row-level use,
and exposed to model validators via the ``.arr``/``.map`` accessors.

Run: python examples/nested_fields.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flycatcher_spark import Field, Schema, col, model_validator
from flycatcher_spark.session import get_spark


class FeatureRowSchema(Schema):
    """A feature-store row: fixed-width embedding + tagged metadata."""

    row_id: int = Field(primary_key=True, ge=0)
    embedding: list[float] = Field(
        min_items=4, max_items=4, item_ge=-1.0, item_le=1.0
    )
    tags: list[str] | None = None
    props: dict[str, int] = Field(min_items=1, required_keys=["version"])

    @model_validator
    def embedding_not_degenerate():
        # accessors compose with the scalar DSL: reject all-zero rows
        return (
            (col("embedding").arr.max() != 0.0)
            | (col("embedding").arr.min() != 0.0),
            "embedding must not be all zeros",
        )


def main() -> None:
    spark = get_spark(app_name="nested_fields", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")

    rows = [
        (1, [0.1, -0.2, 0.3, 0.4], ["a"], {"version": 2}),
        (2, [0.5, 0.5], None, {"version": 1}),            # too short
        (3, [0.1, 0.2, 0.3, 9.0], None, {"version": 1}),  # out of range
        (4, [0.0, 0.0, 0.0, 0.0], None, {"version": 1}),  # degenerate
        (5, [0.1, 0.2, 0.3, 0.4], None, {"build": 7}),    # missing key
    ]
    df = spark.createDataFrame(
        rows,
        "row_id long, embedding array<double>, tags array<string>, "
        "props map<string,bigint>",
    )

    v = FeatureRowSchema.to_spark_validator()
    good = v.validate(df, strict=False)
    print("valid rows:", sorted(r["row_id"] for r in good.collect()))
    for viol in v.last_violations:
        print(f"  {viol['constraint']}: {viol['count']} row(s)")

    # The same schema, row-level: Pydantic enforces the identical rules
    P = FeatureRowSchema.to_pydantic()
    print(P(row_id=9, embedding=[0.1, 0.2, 0.3, 0.4], tags=None,
            props={"version": 3}))
    try:
        P(row_id=9, embedding=[0.1], tags=None, props={"version": 3})
    except Exception as e:
        print("pydantic rejected short embedding:", type(e).__name__)

    spark.stop()


if __name__ == "__main__":
    main()
