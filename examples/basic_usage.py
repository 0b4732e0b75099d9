"""Basic usage: define a schema once, get all three backends.

Capability parity with the reference's basic_usage example
(/root/reference/examples/basic_usage.py), Spark-first.

Run: python examples/basic_usage.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datetime import datetime

from flycatcher_spark import Field, Schema, col, model_validator
from flycatcher_spark.session import get_spark


class UserSchema(Schema):
    """One declarative class → Spark validator, Pydantic model, DDL."""

    id: int = Field(primary_key=True, ge=1)
    name: str = Field(min_length=1, max_length=100)
    email: str = Field(pattern=r"^[^@]+@[^@]+\.[^@]+$")
    age: int | None = Field(ge=0, le=150, nullable=True)
    signup_ts: datetime

    @model_validator
    def adults_need_email():
        return (
            (col("age").is_null() | (col("age") < 18)) | col("email").str.contains("@"),
            "adults must have a valid email",
        )


def main() -> None:
    spark = get_spark(app_name="basic_usage")
    spark.sparkContext.setLogLevel("ERROR")

    ts = datetime(2024, 1, 1, 9, 30)
    df = spark.createDataFrame(
        [
            (1, "Alice", "alice@example.com", 34, ts),
            (2, "Bob", "bob@example.com", None, ts),
            (3, "", "carol@example.com", 28, ts),      # name too short
            (-4, "Dave", "dave@example.com", 41, ts),  # bad id
        ],
        ["id", "name", "email", "age", "signup_ts"],
    )

    # 1. Bulk validation (Spark) — non-strict filters + reports
    validator = UserSchema.to_spark_validator()
    print("constraints:", validator.describe_constraints())
    good = validator.validate(df, strict=False, show_violations=True)
    print("kept rows:", good.count())

    # 2. Row-level validation (Pydantic) — same rules, one object at a time
    Model = UserSchema.to_pydantic()
    row = good.limit(1).collect()[0].asDict()
    print("pydantic round-trip:", Model(**row).model_dump()["name"])

    # 3. DDL generation
    print(UserSchema.to_ddl())

    spark.stop()


if __name__ == "__main__":
    main()
