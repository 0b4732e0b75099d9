"""Z-order (Morton-curve) data layout for multi-dimensional skipping.

The 100 TB problem this solves: parquet scans skip row groups via
min/max statistics, but a table sorted on ONE column has useless
stats on every other column — a predicate on ``(size, price)`` prunes
nothing when the layout orders by ``partkey``. Interleaving the bits
of the predicate columns into one Morton key and range-partitioning +
sorting on it makes every file/row-group a near-rectangle in the
multi-dim space, so min/max stats prune on ALL interleaved columns at
once (the standard lakehouse OPTIMIZE ZORDER BY technique; see the
classic UB-tree / Morton-order literature). A 1000-executor scan of a
100 TB table with a 2-D box predicate then reads the few files whose
rectangles intersect the box instead of all of them.

Everything here is exact integer arithmetic — scale, clamp, shift,
mask, or — generated from ONE spec into either engine dialect
(:func:`zorder_expr` emits Spark SQL or DuckDB SQL), so the
``zorder_locality`` oracle replays the identical key cell-for-cell.
No UDFs anywhere: the key is a pure-Column expression inside
whole-stage codegen, and the write is ``repartitionByRange`` (range
exchange on the key — Spark samples split points) + a mapPartitions-
free ``sortWithinPartitions``.

No reference counterpart: the reference library has no storage-layout
surface; this extends ``generators/ddl.py``'s write family
(``write_bucketed``, ``write_range_partitioned``) with the
multi-dimensional member.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ZDim", "zorder_expr", "zorder_key", "zorder_spans", "write_zorder"]


@dataclass(frozen=True)
class ZDim:
    """One interleaved dimension: an integer-valued SQL expression
    (column name or expression string valid in BOTH dialects) plus
    the domain ``[lo, hi]`` it is scaled from. Values outside the
    domain clamp to the edge bucket (stats pruning stays correct —
    clamping only ever widens a file's true span to the edge).

    At scale ``lo``/``hi`` come from a prior 1-row min/max agg or
    from known domain bounds; they are plain Python ints here so the
    generated expression embeds them as literals on both engines.
    """

    expr: str
    lo: int
    hi: int

    def scaled(self, bits: int, idiv: str) -> str:
        if self.hi <= self.lo:
            raise ValueError(f"ZDim({self.expr}): need hi > lo")
        m = (1 << bits) - 1
        clamped = f"least(greatest({self.expr}, {self.lo}), {self.hi})"
        return f"((({clamped}) - {self.lo}) * {m}) {idiv} {self.hi - self.lo}"


def zorder_expr(dims: list[ZDim], bits: int = 8, dialect: str = "spark") -> str:
    """The Morton key as a SQL expression string: each dimension is
    scaled to ``[0, 2^bits)`` by exact integer arithmetic, then bit
    ``b`` of dimension ``j`` lands at interleaved position
    ``b*k + j``. One generator, two dialects — the Spark plan and the
    DuckDB oracle evaluate the SAME arithmetic, so the key matches
    integer-for-integer (the only dialect split is integer division
    ``div`` vs ``//`` and function-vs-operator shifts).
    """
    if len(dims) < 2:
        raise ValueError("z-ordering needs at least 2 dimensions")
    if bits * len(dims) > 62:
        raise ValueError(f"bits*dims = {bits * len(dims)} exceeds int64")
    if dialect == "spark":
        idiv, shr, shl = "div", "shiftright({x}, {n})", "shiftleft({x}, {n})"
    elif dialect == "duckdb":
        idiv, shr, shl = "//", "(({x}) >> {n})", "(({x}) << {n})"
    else:
        raise ValueError(f"unknown dialect {dialect!r}")
    k = len(dims)
    parts = []
    for j, dim in enumerate(dims):
        s = f"CAST({dim.scaled(bits, idiv)} AS BIGINT)"
        for b in range(bits):
            bit = f"({shr.format(x=s, n=b)} & 1)"
            parts.append(shl.format(x=bit, n=b * k + j))
    return "(" + " + ".join(parts) + ")"


def zorder_key(dims: list[ZDim], bits: int = 8) -> Column:
    """The Morton key as a Spark Column (pure built-in arithmetic —
    whole-stage codegen, no UDF).

    Examples
    --------
        >>> df = spark.createDataFrame([(1, 0), (0, 1)], "x long, y long")
        >>> dims = [ZDim("x", 0, 1), ZDim("y", 0, 1)]
        >>> [r["z"] for r in
        ...  df.select(zorder_key(dims, bits=1).alias("z")).collect()]
        [1, 2]
    """
    return F.expr(zorder_expr(dims, bits, "spark"))


def zorder_spans(
    df: DataFrame,
    dims: list[ZDim],
    bits: int = 8,
    prefix_bits: int = 6,
) -> DataFrame:
    """Locality diagnostic: bucket rows by the TOP ``prefix_bits`` of
    their Morton key (what a file boundary sees after a z-ordered
    range partition) and report each bucket's row count and per-
    dimension min/max span — the rectangles that make multi-dim
    stats pruning work. Columns: ``z_bucket, n, d{j}_min, d{j}_max``.
    """
    total_bits = bits * len(dims)
    if prefix_bits > total_bits:
        raise ValueError("prefix_bits exceeds key width")
    z = zorder_key(dims, bits)
    bucket = F.expr(
        f"shiftright({zorder_expr(dims, bits, 'spark')}, {total_bits - prefix_bits})"
    )
    aggs = [F.count(F.lit(1)).alias("n")]
    for j, dim in enumerate(dims):
        aggs.append(F.min(F.expr(dim.expr)).cast("long").alias(f"d{j}_min"))
        aggs.append(F.max(F.expr(dim.expr)).cast("long").alias(f"d{j}_max"))
    return df.groupBy(bucket.alias("z_bucket")).agg(*aggs)


def write_zorder(
    df: DataFrame,
    path: str,
    dims: list[ZDim],
    bits: int = 8,
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` z-ordered: range-partition on the Morton key
    (Spark samples split points — balanced output files without a
    global sort) and sort within each partition so parquet row-group
    min/max stats are tight on EVERY interleaved dimension.

    The key column is dropped before the write (projection after the
    sort keeps row order), so the layout is invisible to readers —
    they just observe that multi-dim predicates prune. ``n_files``
    bounds output file count; at 100 TB pick it so files land near
    the 128 MB–1 GB sweet spot.
    """
    z = zorder_key(dims, bits).alias("__zorder")
    staged = df.select("*", z)
    staged = (
        staged.repartitionByRange(n_files, "__zorder")
        if n_files
        else staged.repartitionByRange("__zorder")
    )
    (
        staged.sortWithinPartitions("__zorder")
        .drop("__zorder")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
