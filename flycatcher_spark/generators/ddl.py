"""Spark SQL DDL generation + schema-enforced readers/writers.

Replaces the reference's SQLAlchemy backend
(``/root/reference/src/flycatcher/generators/sqlalchemy.py``) with
Spark-native output: a ``CREATE TABLE`` statement derived from the
schema (same auto table naming: class name minus "Schema", lowercased,
plus "s"), plus read/write helpers. Spark cannot *enforce* primary
key/unique/index, so those surface as informational clauses in a
trailing comment — the opt-in runtime check lives at
``SparkValidator.check_unique``.

The read helper is a capability upgrade over the reference: passing
the compiled ``StructType`` as the explicit read schema gives
schema-on-read enforcement and lets the scan prune columns the schema
doesn't declare.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession

from ..fields import _MISSING

if TYPE_CHECKING:  # pragma: no cover
    from ..base import Schema


def table_name_for(schema_cls: "type[Schema]") -> str:
    """Default table name: class name minus 'Schema', lowercased, + 's'."""
    return schema_cls.__name__.removesuffix("Schema").lower() + "s"


def create_table_ddl(
    schema_cls: "type[Schema]",
    table_name: str | None = None,
    *,
    using: str = "parquet",
) -> str:
    """Generate a Spark SQL ``CREATE TABLE`` statement.

    Examples
    --------
        >>> from flycatcher_spark import Schema, Field
        >>> class UserSchema(Schema):
        ...     id: int = Field(primary_key=True)
        ...     name: str = Field(max_length=50)
        ...     bio: str | None = None
        >>> print(UserSchema.to_ddl())  # doctest: +NORMALIZE_WHITESPACE
        CREATE TABLE users (
          id BIGINT NOT NULL,
          name VARCHAR(50) NOT NULL,
          bio STRING
        ) USING parquet
        -- informational constraints (not enforced by Spark):
        --   PRIMARY KEY (id)
    """
    if table_name is None:
        table_name = table_name_for(schema_cls)

    column_lines = []
    info_lines = []
    pk_cols = []
    for name, field in schema_cls.fields().items():
        parts = [name, field.get_ddl_type()]
        if not field.nullable:
            parts.append("NOT NULL")
        if field.default is not _MISSING and field.default is not None:
            parts.append(f"DEFAULT {_sql_literal(field.default)}")
        if field.description:
            escaped = str(field.description).replace("'", "''")
            parts.append(f"COMMENT '{escaped}'")
        column_lines.append("  " + " ".join(parts))

        if field.primary_key:
            pk_cols.append(name)
        if field.unique:
            info_lines.append(f"--   UNIQUE ({name})")
        if field.index:
            info_lines.append(f"--   INDEX ({name})")
        if field.autoincrement:
            info_lines.append(f"--   AUTOINCREMENT ({name})")

    if pk_cols:
        info_lines.insert(0, f"--   PRIMARY KEY ({', '.join(pk_cols)})")

    ddl = (
        f"CREATE TABLE {table_name} (\n"
        + ",\n".join(column_lines)
        + f"\n) USING {using}"
    )
    if info_lines:
        ddl += "\n-- informational constraints (not enforced by Spark):\n"
        ddl += "\n".join(info_lines)
    return ddl


def _sql_literal(value) -> str:
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return str(value)
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


def read(
    spark: SparkSession,
    schema_cls: "type[Schema]",
    path: str,
    fmt: str = "parquet",
    **options,
) -> DataFrame:
    """Read ``path`` with the schema applied at scan time.

    For parquet the declared schema prunes unread columns at the
    scan; for CSV/JSON it replaces inference (one less pass over the
    data) and coerces types on read.

    Examples
    --------
        >>> from flycatcher_spark import Schema
        >>> class T(Schema):
        ...     a: int
        >>> path = str(getfixture("tmp_path") / "t")
        >>> spark.createDataFrame([(1, "x")], ["a", "b"]).write.parquet(path)
        >>> read(spark, T, path).columns  # b pruned, a cast long
        ['a']
    """
    struct = schema_cls.to_spark_schema()
    reader = spark.read.format(fmt).options(**options)
    if fmt in ("csv", "json"):
        reader = reader.schema(struct)
        return reader.load(path)
    df = reader.load(path)
    # Parquet scans keep their own physical types; project/cast to the
    # declared schema so column pruning reaches the scan.
    from pyspark.sql import functions as F

    present = set(df.columns)
    return df.select(
        *[
            F.col(f.name).try_cast(f.dataType).alias(f.name)
            for f in struct.fields
            if f.name in present
        ]
    )


def write(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """Write a validated DataFrame, optionally partitioned.

    Examples
    --------
        >>> path = str(getfixture("tmp_path") / "out")
        >>> df = spark.range(4).withColumn("part", F.col("id") % 2)
        >>> write(df, path, partition_by=["part"])
        >>> spark.read.parquet(path).count()
        4
    """
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write as a bucketed (and optionally sorted) managed table.

    Two tables bucketed on the same columns with the same bucket
    count join WITHOUT an Exchange on either side — the shuffle is
    paid once at write time instead of on every join. This is the
    storage-layout lever for repeated co-located joins at 100 TB
    (e.g. fact tables repeatedly joined on the same key).
    """
    writer = (
        df.write.format(fmt)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    **properties,
) -> None:
    """Write a validated DataFrame to a JDBC sink (the reference's
    SQLAlchemy-insert pipeline shape, executor-parallel)."""
    df.write.jdbc(url=url, table=table, mode=mode, properties=properties)


def read_routed(
    spark: SparkSession,
    schema_cls: "type[Schema]",
    path: str,
    fmt: str = "json",
    corrupt_col: str = "_corrupt_record",
    **options,
) -> "tuple[DataFrame, DataFrame]":
    """Schema-on-read with corrupt-record routing: returns
    ``(good, quarantine)``.

    Malformed source lines (broken JSON, CSV rows that don't fit the
    schema) must not kill a 100 TB ingest, and silently dropping them
    (``mode=DROPMALFORMED``) loses data. This reads PERMISSIVE with
    the corrupt-record capture column appended to the declared
    schema: parseable rows come back typed in ``good``; unparseable
    lines come back verbatim in ``quarantine`` (one string column
    ``raw``) for reprocessing — the dead-letter pattern.

    The parsed frame is persisted so both outputs come from ONE scan
    of the source (Spark also disallows filters that reference only
    the internal corrupt column on an unpersisted raw scan); at
    cluster scale this is the stage you'd write to a silver/dead-
    letter table pair. Downstream, ``good`` feeds
    ``schema_cls.to_spark_validator().validate(...)`` — parse errors
    and constraint violations stay separately accounted.
    """
    from pyspark.sql.types import StringType, StructField, StructType

    struct = schema_cls.to_spark_schema()
    if corrupt_col in struct.fieldNames():
        raise ValueError(
            f"read_routed: schema already defines {corrupt_col!r}"
        )
    # StructType.add mutates in place — build a fresh StructType so the
    # declared schema (used for the good-side projection) stays clean.
    read_schema = StructType(
        list(struct.fields) + [StructField(corrupt_col, StringType(), True)]
    )
    raw = (
        spark.read.format(fmt)
        .options(**options)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(read_schema)
        .load(path)
    )
    # Tracked (flycatcher_spark.caching) so a long-lived session can
    # release the parsed cache once both sides are written out.
    from .. import caching

    raw = caching.track(raw)
    from pyspark.sql import functions as F

    good = raw.where(F.col(corrupt_col).isNull()).select(
        *[f.name for f in struct.fields]
    )
    quarantine = raw.where(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw")
    )
    return good, quarantine


def write_range_partitioned(
    df: DataFrame,
    path: str,
    by: "list[str]",
    num_files: int = 32,
    fmt: str = "parquet",
    mode: str = "error",
    **options,
) -> None:
    """Write with range partitioning + within-file sort on ``by`` —
    the storage layout that makes min/max data skipping work.

    ``repartitionByRange`` gives every output file a disjoint key
    range and ``sortWithinPartitions`` orders rows inside it, so the
    parquet footer's per-row-group min/max statistics become tight:
    a reader filtering on ``by`` prunes whole files/row-groups
    without touching them. On 100 TB fact tables sorted by their
    dominant filter column (ship date, event time), selective scans
    skip almost everything — the same scan-side win as partition
    pruning, but continuous-valued.

    The range boundaries come from sampling (one extra job); at
    cluster scale prefer writing date-partitioned directories AND
    range-sorting within each for two pruning levels.

    Examples
    --------
        >>> path = str(getfixture("tmp_path") / "ranged")
        >>> write_range_partitioned(spark.range(100), path, by=["id"],
        ...                         num_files=4)
        >>> spark.read.parquet(path).count()
        100
    """
    writer = (
        df.repartitionByRange(num_files, *by)
        .sortWithinPartitions(*by)
        .write.format(fmt)
        .mode(mode)
        .options(**options)
    )
    writer.save(path)
