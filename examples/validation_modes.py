"""The four validation modes and when to use each.

Capability parity with /root/reference/examples/validation_modes.py,
plus the two Spark-only scale modes (validate_lazy, flag_violations).

Run: python examples/validation_modes.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flycatcher_spark import Field, Schema
from flycatcher_spark.session import get_spark


class ReadingSchema(Schema):
    sensor_id: int = Field(ge=0)
    value: float = Field(ge=-50.0, le=150.0)
    unit: str = Field(pattern="^(C|F)$")


def main() -> None:
    spark = get_spark(app_name="validation_modes")
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        [(1, 21.5, "C"), (2, 999.0, "C"), (3, 70.2, "F"), (-9, 12.0, "K")],
        ["sensor_id", "value", "unit"],
    )
    v = ReadingSchema.to_spark_validator()

    # Mode 1 — strict (default): first violated constraint raises with
    # count + sample rows. Use in tests/CI gates.
    try:
        v.validate(df)
    except ValueError as e:
        print("strict raised:\n", str(e).splitlines()[0])

    # Mode 2 — non-strict: filter bad rows, keep diagnostics.
    good = v.validate(df, strict=False)
    print("non-strict kept:", good.count(), "violations:", [
        (x["constraint"], x["count"]) for x in v.last_violations
    ])

    # Mode 3 — lazy (100 TB path): pure transformation, zero jobs; no
    # diagnostics. Fuses with downstream plans, predicates push into
    # the scan.
    fast = v.validate_lazy(df)
    fast.explain()

    # Mode 4 — flag: no rows dropped; route by the _violations array.
    flagged = v.flag_violations(df)
    flagged.select("sensor_id", "_violations").show(truncate=False)
    quarantine = flagged.filter(F.size("_violations") > 0)
    print("quarantined:", quarantine.count())

    spark.stop()


if __name__ == "__main__":
    main()
