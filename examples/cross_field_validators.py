"""Cross-field validators: business rules spanning multiple columns.

Capability parity with the reference's cross_field_validators example
(/root/reference/examples/cross_field_validators.py): bare-expression
validators, (expr, message) tuples, and the backend-dict format
({'spark': ..., 'pydantic': ...} — the reference's 'polars' key is
'spark' here), demonstrated both row-level (Pydantic) and bulk
(Spark validator).

Run: python examples/cross_field_validators.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datetime import datetime

from flycatcher_spark import Field, Schema, col, model_validator
from flycatcher_spark.session import get_spark


class ContractSchema(Schema):
    """Contracts: date ordering + conditional bonus rule."""

    contract_id: int = Field(primary_key=True, ge=1)
    team: str = Field(min_length=2, max_length=50)
    start_date: datetime
    end_date: datetime
    base_salary: float = Field(gt=0)
    bonus: float | None = Field(ge=0, nullable=True)

    @model_validator
    def end_after_start():
        # bare expression: message auto-derived from the function name
        return col("end_date") > col("start_date")

    @model_validator
    def bonus_capped():
        """Backend-dict format: a Spark column expression for bulk
        validation plus a row-level callable for the Pydantic model —
        use it when the two backends need different null handling."""

        def pydantic_rule(v):
            if v.bonus is not None and v.bonus > v.base_salary * 0.5:
                raise ValueError("bonus cannot exceed 50% of base salary")
            return v

        return {
            "spark": (
                col("bonus").is_null() | (col("bonus") <= col("base_salary") * 0.5),
                "bonus cannot exceed 50% of base salary",
            ),
            "pydantic": pydantic_rule,
        }


class GameSchema(Schema):
    """Game results: inequality + Kleene-OR conditional logic."""

    game_id: int = Field(primary_key=True, ge=1)
    home_team: str = Field(min_length=2, max_length=50)
    away_team: str = Field(min_length=2, max_length=50)
    home_score: int = Field(ge=0)
    away_score: int = Field(ge=0)
    overtime: str | None = Field(nullable=True)

    @model_validator
    def teams_differ():
        return (
            col("home_team") != col("away_team"),
            "a team cannot play itself",
        )

    @model_validator
    def tie_needs_overtime():
        return (
            (col("home_score") != col("away_score")) | col("overtime").is_not_null(),
            "tied games must record overtime",
        )


def row_level() -> None:
    print("== Pydantic (row-level)")
    Contract = ContractSchema.to_pydantic()
    ok = Contract(
        contract_id=1,
        team="LAL",
        start_date=datetime(2023, 7, 1),
        end_date=datetime(2026, 6, 30),
        base_salary=5_000_000.0,
        bonus=1_000_000.0,
    )
    print(f"  valid contract accepted: id={ok.contract_id}")
    for label, kwargs in [
        ("end before start", dict(start_date=datetime(2024, 7, 1),
                                  end_date=datetime(2023, 6, 30), bonus=None)),
        ("bonus over 50%", dict(start_date=datetime(2023, 7, 1),
                                end_date=datetime(2025, 6, 30),
                                bonus=4_000_000.0)),
    ]:
        try:
            Contract(contract_id=2, team="GSW", base_salary=5_000_000.0, **kwargs)
            raise AssertionError(f"{label}: should have been rejected")
        except ValueError as e:
            print(f"  {label}: rejected ({type(e).__name__})")


def bulk(spark) -> None:
    print("== Spark validator (bulk)")
    games = spark.createDataFrame(
        [
            (1, "LAL", "BOS", 108, 105, None),
            (2, "GSW", "MIA", 120, 115, None),
            (3, "BOS", "LAL", 95, 98, None),
            (4, "PHX", "PHX", 110, 108, None),   # same team
            (5, "MIA", "DEN", 105, 105, None),   # tie without overtime
            (6, "NYK", "CHI", 99, 99, "OT"),     # tie WITH overtime: ok
        ],
        ["game_id", "home_team", "away_team", "home_score", "away_score", "overtime"],
    )
    v = GameSchema.to_spark_validator()
    good = v.validate(games, strict=False)
    kept = sorted(r["game_id"] for r in good.collect())
    print(f"  kept games: {kept}")
    for viol in v.last_violations:
        print(f"  violation: {viol['constraint']!r} x{viol['count']}")
    assert kept == [1, 2, 3, 6]

    try:
        v.validate(games, strict=True)
        raise AssertionError("strict mode should raise")
    except ValueError as e:
        print(f"  strict mode raised: {str(e).splitlines()[0]}")


def main() -> None:
    spark = get_spark(app_name="cross_field_validators")
    spark.sparkContext.setLogLevel("ERROR")
    row_level()
    bulk(spark)
    print("OK")
    spark.stop()


if __name__ == "__main__":
    main()
