"""As-of (nearest-preceding) join — a time-series primitive Spark
lacks natively, expressed as a union + sorted window instead of a
range join.

The naive formulation (``l.ts >= r.ts`` + argmax) plans as a
BroadcastNestedLoopJoin — O(|L|·|R|) on one task. This operator
instead unions both sides tagged, sorts each key partition once, and
carries the right side's most recent row forward with
``last(ignorenulls=True)`` over ONE packed struct (so every attached
column provably comes from the same right row):

    one shuffle on the key, one sort, zero joins —
    cost O((|L|+|R|) log batch) per partition, any scale.

Semantics match DuckDB's ``ASOF LEFT JOIN`` on
``l.key = r.key AND l.ts >= r.ts`` (inclusive: a right row at exactly
``l.ts`` matches), which serves as the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    ts_col: str = "ts",
    right_ts_col: str | None = None,
    suffix: str = "_right",
    how: str = "left",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    timestamp ≤ the left timestamp, per key.

    Parameters
    ----------
    on : key column(s) shared by both sides.
    ts_col : left timestamp column (numeric or timestamp).
    right_ts_col : right timestamp column (defaults to ``ts_col``).
    suffix : appended to attached right-side columns; the matched
        right timestamp is exposed as ``{right_ts_col}{suffix}``.
    how : 'left' keeps unmatched left rows (right columns null);
        'inner' drops them.

    Examples
    --------
        >>> trades = spark.createDataFrame(
        ...     [("A", 3), ("A", 7)], ["sym", "ts"])
        >>> quotes = spark.createDataFrame(
        ...     [("A", 1, 10.0), ("A", 5, 11.0), ("A", 9, 12.0)],
        ...     ["sym", "ts", "px"])
        >>> out = asof_join(trades, quotes, on="sym", ts_col="ts")
        >>> sorted((r.ts, r.px_right) for r in out.collect())
        [(3, 10.0), (7, 11.0)]
    """
    keys = [on] if isinstance(on, str) else list(on)
    right_ts_col = right_ts_col or ts_col

    right_vals = [c for c in right.columns if c not in keys and c != right_ts_col]
    left_cols = list(left.columns)
    struct_fields = [*right_vals, right_ts_col]
    struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in struct_fields]
    )

    l_tagged = left.select(
        *[F.col(c) for c in left_cols],
        F.col(ts_col).alias("__asof_ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(struct_type).alias("__rv"),
    )
    r_tagged = right.select(
        *[F.col(k) for k in keys],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
            if c not in keys
        ],
        F.col(right_ts_col).alias("__asof_ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*[F.col(c).alias(c) for c in struct_fields]).alias("__rv"),
    ).select(*l_tagged.columns)  # align column order

    u = l_tagged.unionByName(r_tagged)
    # right rows sort before left rows at equal timestamps → inclusive
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__asof_ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *[F.col(c) for c in left_cols],
        F.col("__is_left"),
        F.last(F.col("__rv"), ignorenulls=True).over(w).alias("__rv"),
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left_cols],
        *[F.col(f"__rv.{c}").alias(f"{c}{suffix}") for c in struct_fields],
    )
    if how == "inner":
        out = out.filter(F.col(f"{right_ts_col}{suffix}").isNotNull())
    return out
