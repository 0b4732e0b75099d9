"""Skew-handling join utilities.

AQE's skew-join splitting handles sort-merge skew automatically, but
two patterns still need explicit treatment at 100 TB:

- **salted aggregation**: a groupBy on a key where a handful of hot
  keys dominate — pre-aggregate on (key, salt) then merge.
- **salted join**: joining a huge skewed fact against a table too big
  to broadcast — replicate the small side per salt so hot keys spread
  over ``salt_buckets`` reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_buckets: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform random-ish salt derived deterministically from the full
    row via ``spark_partition_id``+monotonic id — stable within a
    plan, no Python RNG on executors."""
    return df.withColumn(
        salt_col,
        F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).cast("int"),
    )


def salted_groupby_count(
    df: DataFrame, keys: list[str], salt_buckets: int = 16
) -> DataFrame:
    """Two-stage count for heavily skewed keys: partial count per
    (key, salt), then merge per key. The first shuffle spreads each
    hot key over ``salt_buckets`` reducers; the second shuffle moves
    only ``buckets`` pre-aggregated rows per key."""
    salted = with_salt(df, salt_buckets)
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` is skewed on ``on`` and ``small`` is
    too large to broadcast: salt the big side, replicate the small
    side once per salt (explode of a literal range — ×buckets rows,
    map-only), and join on (key, salt). Hot keys land on
    ``salt_buckets`` distinct reducers instead of one straggler."""
    big_salted = with_salt(big, salt_buckets)
    small_replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>")),
    )
    out = big_salted.join(small_replicated, on=[on, "__salt"], how=how)
    return out.drop("__salt")
