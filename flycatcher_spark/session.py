"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[N]``; the same configuration expresses the
knobs that matter on a real cluster: AQE (runtime re-planning +
skew-join handling), Arrow for the pandas-UDF paths, and a UTC
session timezone so timestamp semantics are stable across
driver/executor environments (SURVEY.md §7.4 item 7).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "flycatcher_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    default_parallelism: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``default_parallelism`` caps ``spark.default.parallelism`` — the
    partition count of ``parallelize``/``createDataFrame``-from-local
    sources, NOT DataFrame shuffles (``shuffle_partitions``) and NOT
    the core count. Test/doctest sessions set it low (8): a 300-row
    local frame otherwise lands in 32 partitions on local[32] and
    every downstream stage pays 32 python-worker tasks of scheduler
    overhead — measured 0.7 s vs 3-5 s per tiny-join action, ~4x on
    the whole suite's per-action tax. Leave unset for real inputs
    (parquet scans ignore it) and for the bench, whose widening
    guards read ``sparkContext.defaultParallelism``."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or os.environ.get("SPARK_GRAFT_CPUS", 32)),
        )
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if default_parallelism is not None:
        builder = builder.config(
            "spark.default.parallelism", str(default_parallelism)
        )
    return builder.getOrCreate()
