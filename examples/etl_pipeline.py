"""ETL: schema-enforced extract → validate → partitioned load.

Capability parity with /root/reference/examples/etl_pipeline.py
(CSV → validate → database), Spark-first: the read applies the
compiled schema at scan time, validation is one lazy filter, and the
load writes partitioned parquet (swap `ddl.write` for
`ddl.write_jdbc` for a database sink).

Run: python examples/etl_pipeline.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from datetime import datetime

from flycatcher_spark import Field, Schema, col, model_validator
from flycatcher_spark.generators import ddl
from flycatcher_spark.session import get_spark


class OrderSchema(Schema):
    order_id: int = Field(primary_key=True, ge=1)
    customer: str = Field(min_length=1)
    amount: float = Field(gt=0.0)
    discount: float = Field(ge=0.0, le=0.9)
    placed_at: datetime

    @model_validator
    def net_positive():
        return (col("amount") * (1 - col("discount")) > 0, "net must be positive")


CSV = """order_id,customer,amount,discount,placed_at
1,acme,100.0,0.1,2024-05-01T10:00:00
2,globex,250.5,0.0,2024-05-01T11:30:00
3,initech,-5.0,0.2,2024-05-02T09:15:00
4,,80.0,0.05,2024-05-02T14:45:00
oops,acme,12.0,0.0,2024-05-03T08:00:00
"""


def main() -> None:
    spark = get_spark(app_name="etl_pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    workdir = Path(tempfile.mkdtemp())
    src = workdir / "orders.csv"
    src.write_text(CSV)

    # Extract — the declared StructType replaces inference: bad cells
    # (like order_id='oops') become nulls for the validator to handle.
    raw = ddl.read(spark, OrderSchema, str(src), fmt="csv", header=True)

    # Transform — validate; bad rows are filtered with diagnostics.
    v = OrderSchema.to_spark_validator()
    clean = v.validate(raw, strict=False, show_violations=True)
    print("clean rows:", clean.count())

    # Load — partitioned parquet sink (write_jdbc for databases).
    out = workdir / "orders_clean"
    ddl.write(clean, str(out), mode="overwrite")
    print("reloaded:", spark.read.parquet(str(out)).count())
    print(OrderSchema.to_ddl())

    spark.stop()


if __name__ == "__main__":
    main()
