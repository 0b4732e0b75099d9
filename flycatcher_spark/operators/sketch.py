"""Mergeable sketches with engine-portable determinism: HyperLogLog
distinct counting and count-min-sketch frequency estimation.

The scale story (SURVEY.md §7.1 step 7 — pipeline extensions beyond
the reference surface): at 100 TB, "how many distinct url hosts /
users / tokens" and "how often does this token appear" cannot afford
an exact shuffle of every key. Sketches bound the shuffle at a fixed
size (4096 registers, depth×width counters) regardless of input
scale, and — because both sketch types merge by a commutative
monoid (register-wise ``max``, counter-wise ``sum``) — partial
sketches combine map-side, across shards, across days, and across
corpora without revisiting raw data.

The twist over ``approx_count_distinct`` (stats.py, Spark's HLL++):
that sketch is *implementation-specific*, so its estimates can only
ever get rows-only driver evidence (``approx_distinct`` is the
registry's documented example). The sketches here are built from
md5 — the repo's one deterministic hash (``text.md5_bucket``) — so
a DuckDB oracle reproduces every register, every counter, and every
final estimate **cell for cell**. An approximate operator with an
exact cross-engine oracle: the estimate itself is deterministic even
though it approximates the true count.

Engine-parity rules used throughout (each probed on both engines):

- 64-bit-ish hashing: hex substrings of ``md5(CAST(key AS VARCHAR))``
  parsed with Spark ``conv(h, 16, 10)`` == DuckDB
  ``CAST(concat('0x', h) AS BIGINT)``.
- bit length without floats: ``length(bin(w))`` — both engines print
  minimal binary (no leading zeros); ``w = 0`` is CASE-handled.
- the HLL harmonic denominator stays EXACT integer arithmetic
  (``sum(1 << (49 - max_rho))``, ≤ 2^60 for p=12 — fits int64) until
  one final int→double cast + one divide + one add, all individually
  IEEE-deterministic; no transcendental functions anywhere.

No reference counterpart: the reference library (flycatcher v0.2.0)
contains no sketch code; this module is scale infrastructure for the
§7 training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_registers",
    "hll_estimate",
    "hll_merge",
    "hll_alpha_m2",
    "cms_sketch",
    "cms_merge",
    "cms_lookup",
]

#: Bits of the md5 tail used for the leading-zero count. 12 hex chars
#: = 48 bits; max rho = 49 (all-zero tail). Fixed so the scaled
#: denominator sum stays within int64 for every supported p.
_HLL_W_BITS = 48
_HLL_MAX_RHO = _HLL_W_BITS + 1


def _check_p(p: int) -> int:
    # hex-aligned register index keeps the Spark and DuckDB
    # expressions identical substring slices (no cross-nibble masks)
    if p not in (8, 12, 16):
        raise ValueError(f"p must be 8, 12 or 16 (hex-aligned), got {p}")
    return p // 4


def hll_alpha_m2(p: int) -> float:
    """The HLL bias constant alpha_m * m^2 (Flajolet et al. 2007,
    §4 "practical considerations"), computed ONCE driver-side and
    embedded as the same float literal in both engines — literal
    embedding beats trusting two SQL parsers to fold the same
    expression identically."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m)  # the m >= 128 branch; all supported p qualify
    return alpha * m * m


def _hash_cols(key: Column, p: int) -> tuple[Column, Column]:
    """(register index, 48-bit tail) from md5(key) — the Spark side
    of the shared hash definition. DuckDB replica::

        idx = CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), 1, p/4)) AS BIGINT)
        w   = CAST(concat('0x', substr(md5(CAST(k AS VARCHAR)), p/4+1, 12)) AS BIGINT)
    """
    nhex = _check_p(p)
    h = F.md5(key.cast("string"))
    idx = F.conv(F.substring(h, 1, nhex), 16, 10).cast("long")
    w = F.conv(F.substring(h, nhex + 1, 12), 16, 10).cast("long")
    return idx, w


def _rho(w: Column) -> Column:
    """Leading-zero rank of the 48-bit tail: 49 - bitlen(w), with the
    all-zero tail pinned to 49. ``length(bin(w))`` is the portable
    float-free bit length (both engines print minimal binary)."""
    return (
        F.when(w == 0, F.lit(_HLL_MAX_RHO))
        .otherwise(F.lit(_HLL_MAX_RHO) - F.length(F.bin(w)))
        .cast("int")
    )


def hll_registers(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 12,
) -> DataFrame:
    """The HLL sketch itself: one row per (group, register) with the
    max leading-zero rank observed — ``(group_cols…, register,
    max_rho)``.

    This IS the mergeable partial: ``groupBy(register).max(max_rho)``
    is a monoid, so Spark's map-side partial aggregation collapses
    every partition to ≤ m rows before the shuffle — the shuffle
    carries at most ``n_partitions × m`` tiny rows no matter how many
    input rows exist, and sketches from different days/shards union
    through :func:`hll_merge` without touching raw data again.
    Null keys are skipped (SQL ``COUNT(DISTINCT)`` semantics).
    """
    groups = list(group_cols or [])
    idx, w = _hash_cols(F.col(key_col), p)
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*groups, idx.alias("register"), _rho(w).alias("rho"))
        .groupBy(*groups, "register")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union partial sketches (same p, same group columns) into one:
    register-wise max. The cross-corpus / cross-day combine — cost is
    proportional to sketch size, never to data size."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("max_rho",)]
    return out.groupBy(*keys).agg(F.max("max_rho").alias("max_rho"))


def hll_estimate(
    df: DataFrame,
    key_col: str | None = None,
    group_cols: list[str] | None = None,
    p: int = 12,
    from_registers: bool = False,
) -> DataFrame:
    """Per-group distinct estimate from an HLL sketch:
    ``(group_cols…, n_registers, denom_scaled, hll_ndv)``.

    ``denom_scaled = Σ_j 2^(49 - max_rho_j)`` is kept as an EXACT
    int64 (the oracle matches it integer-for-integer); the raw
    Flajolet estimate ``alpha_m2 / (denom_scaled/2^49 + zeros)``
    then needs exactly one int→double cast, one power-of-two scale,
    one add and one divide — each IEEE-deterministic, so even the
    float column hash-matches cross-engine (rounded to 4 decimals as
    belt and braces). Empty registers contribute 2^0 = 1 each via the
    ``(m - n_registers)`` term.

    The small-range linear-counting correction (m·ln(m/V)) is
    deliberately NOT applied: ``ln`` is a libm call whose last ulp
    differs across engines. Raw-estimate bias below ~2.5m is the
    documented trade for a cell-exact oracle; callers needing
    corrected small-range counts should use exact
    ``count_distinct`` there (small range == cheap shuffle).

    Pass ``from_registers=True`` to estimate from an existing
    :func:`hll_registers` / :func:`hll_merge` output instead of raw
    rows (``key_col`` is ignored then).

    Examples
    --------
        >>> df = spark.createDataFrame(
        ...     [("a",), ("b",), ("c",), ("a",)], "k string")
        >>> hll_estimate(df, "k", p=8).first()["n_registers"]
        3
    """
    groups = list(group_cols or [])
    m = 1 << p
    reg = df if from_registers else hll_registers(df, key_col, groups, p)
    agg = reg.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n_registers"),
        # the Python-API shiftleft pins numBits to a literal; the SQL
        # form takes an expression (and matches the DuckDB `<<` replica)
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_MAX_RHO} - max_rho)")
        ).alias("denom_scaled"),
    )
    two49 = float(1 << _HLL_MAX_RHO)
    denom = (
        F.col("denom_scaled").cast("double") / F.lit(two49)
        + (F.lit(m) - F.col("n_registers")).cast("double")
    )
    return agg.select(
        *groups,
        "n_registers",
        "denom_scaled",
        F.round(F.lit(hll_alpha_m2(p)) / denom, 4).alias("hll_ndv"),
    )


def _cms_bucket(key: Column, row: Column, width: int) -> Column:
    """Row-seeded deterministic bucket: first 8 hex chars of
    ``md5(row ':' key)`` mod width — the ``text.md5_bucket`` idiom
    with the row id as seed, replayable in DuckDB as
    ``CAST(concat('0x', substr(md5(concat(row, ':', CAST(k AS
    VARCHAR))), 1, 8)) AS BIGINT) % width``."""
    h = F.md5(F.concat_ws(":", row.cast("string"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % int(width)


def _rows_array(depth: int) -> Column:
    return F.array(*[F.lit(i) for i in range(depth)])


def cms_sketch(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = 4,
    width: int = 1024,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of a key
    column: ``(group_cols…, row, bucket, cnt)`` — ``depth`` hash rows
    of ``width`` counters, ``cnt = Σ weight`` of the keys landing in
    each cell (weight 1 if ``weight_col`` is None).

    Each input key fans out to ``depth`` (row, bucket) cells via a
    per-key ``explode`` of the literal row array; the groupBy then
    collapses map-side to ≤ depth×width rows per partition before the
    shuffle — like the HLL the wire cost is sketch-sized, not
    data-sized, and :func:`cms_merge` combines sketches by plain
    counter addition (days, shards, corpora).
    """
    groups = list(group_cols or [])
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    expanded = (
        df.filter(F.col(key_col).isNotNull())
        .select(*groups, F.col(key_col).alias("__k"), w.alias("__w"),
                F.explode(_rows_array(depth)).alias("row"))
    )
    return (
        expanded.select(
            *groups,
            "row",
            _cms_bucket(F.col("__k"), F.col("row"), width).alias("bucket"),
            "__w",
        )
        .groupBy(*groups, "row", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union partial CMS sketches (same depth/width/groups):
    counter-wise sum."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_lookup(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate frequencies for a (small) candidate key set:
    each key probes its ``depth`` cells and takes the min —
    ``(key_col, cms_est)``. Guarantees ``cms_est ≥ true count``
    (counters only ever over-count via collisions), with error ≤
    ε·N at probability 1-δ for depth=⌈ln 1/δ⌉, width=⌈e/ε⌉.

    The sketch is ≤ depth×width rows, so Spark broadcasts it — the
    probe is a map-only broadcast hash join on (row, bucket), no
    shuffle of the candidate set. At 100 TB the candidates come from
    a cheap per-partition pre-top-k (the ``vocab_topk``
    TakeOrderedAndProject shape); the sketch then serves any number
    of later point queries without re-scanning the corpus.

    Examples
    --------
        >>> df = spark.createDataFrame(
        ...     [("a",), ("b",), ("c",), ("a",)], "k string")
        >>> looked = cms_lookup(cms_sketch(df, "k"), df.distinct(), "k")
        >>> sorted((r["k"], r["cms_est"]) for r in looked.collect())
        [('a', 2), ('b', 1), ('c', 1)]
    """
    probes = (
        keys.select(F.col(key_col), F.explode(_rows_array(depth)).alias("row"))
        .withColumn("bucket", _cms_bucket(F.col(key_col), F.col("row"), width))
    )
    joined = probes.join(
        F.broadcast(sketch.select("row", "bucket", "cnt")),
        on=["row", "bucket"],
        how="left",
    )
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )
