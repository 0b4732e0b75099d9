"""Corpus release versioning: diff two corpus snapshots.

Training corpora ship as releases; every release needs an auditable
answer to "what changed since last time" — which documents were
added, removed, or edited — both for data cards and for downstream
invalidation (a changed doc invalidates its chunks, embeddings, and
dedup verdicts). At 100 TB a naive text comparison is hopeless; the
Spark-first shape is:

- **fingerprint, then diff**: each side reduces to
  ``(id, md5(content))`` map-side, so the only shuffle carries two
  slim columns per row — never document bodies;
- one full-outer equi-join on the id classifies every document in a
  single pass: ``added`` (new side only), ``removed`` (old side
  only), ``changed`` (both, fingerprints differ), ``unchanged``.

md5 (not xxhash64) keeps the fingerprint engine-portable, so release
manifests written by other systems (or the DuckDB oracle) agree
byte-for-byte.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Unit separator — joins content columns unambiguously (a value
#: cannot contain it in practice, unlike ',' or ' ').
_SEP = "\x1f"


def content_fingerprint(cols: Sequence[str]):
    """md5 fingerprint Column over the given content columns
    (null-safe: nulls hash as empty via coalesce so a null and a
    missing column differ from the string 'None').

    Examples
    --------
        >>> df = spark.createDataFrame([("a", None)], "x string, y string")
        >>> r = df.select(content_fingerprint(["x", "y"]).alias("fp")).first()
        >>> len(r["fp"])
        32
    """
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    return F.md5(F.concat_ws(_SEP, *parts))


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """Classify every document across two corpus releases.

    Returns ``(id, status, old_fp, new_fp)`` with ``status`` one of
    ``added | removed | changed | unchanged``. Ids must be unique
    within each side (the usual corpus invariant; enforced upstream
    by the dedup stages).

    Examples
    --------
        >>> old = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
        >>> new = spark.createDataFrame([(2, "B"), (3, "c")], ["doc_id", "text"])
        >>> sorted((r.doc_id, r.status) for r in corpus_diff(old, new).collect())
        [(1, 'removed'), (2, 'changed'), (3, 'added')]
    """
    fp = content_fingerprint(content_cols)
    o = old.select(F.col(id_col), fp.alias("old_fp"))
    n = new.select(F.col(id_col), fp.alias("new_fp"))
    joined = o.join(n, on=id_col, how="full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("added"))
        .when(F.col("new_fp").isNull(), F.lit("removed"))
        .when(F.col("old_fp") != F.col("new_fp"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(F.col(id_col), status.alias("status"), "old_fp", "new_fp")


def diff_summary(diff: DataFrame) -> DataFrame:
    """One row per status with counts — the release-notes number."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))


def schema_drift(old: DataFrame, new: DataFrame) -> DataFrame:
    """Column-level release diff: which columns were ``added`` /
    ``removed`` / ``type_changed`` / ``unchanged`` between two
    snapshots — ``(column, status, dtype_old, dtype_new)``.

    Driver-side metadata compare (schemas, not data — zero jobs);
    row order is the union of both schemas in first-appearance order
    so release notes read stably. The data-level companion is
    :func:`profile_drift`.
    """
    o = dict(old.dtypes)
    n = dict(new.dtypes)
    rows = []
    for c in list(o) + [c for c in n if c not in o]:
        if c in o and c not in n:
            rows.append((c, "removed", o[c], None))
        elif c not in o and c in n:
            rows.append((c, "added", None, n[c]))
        elif o[c] != n[c]:
            rows.append((c, "type_changed", o[c], n[c]))
        else:
            rows.append((c, "unchanged", o[c], n[c]))
    return old.sparkSession.createDataFrame(
        rows, "column string, status string, dtype_old string, dtype_new string"
    )


def profile_drift(
    old: DataFrame,
    new: DataFrame,
    columns: Sequence[str],
    exact: bool = True,
) -> DataFrame:
    """Data-level drift for the columns both releases share: row
    counts, null fractions, distinct counts and (numeric) means side
    by side with their deltas — the release-gate numbers that catch
    "the new crawl silently nulled 30% of a field" before training.

    ``(column, n_old, n_new, null_frac_old, null_frac_new,
    null_frac_delta, ndv_old, ndv_new, mean_old, mean_new,
    mean_delta)``; fractions/deltas rounded to 6, means to 6 (null
    for non-numeric columns). Cost: ONE conditional-aggregation scan
    per side (stats.profile_stats), a driver-side join of two
    column-count-sized tables — at 100 TB this is two scans, no
    shuffle wider than the aggregation's partials.

    Engine-parity note (the reason the ``profile_drift`` oracle can
    hash-match): with ``exact=True`` the distinct counts are exact,
    and the means stay deterministic when the profiled columns hold
    integer-valued data (integer sums in doubles are exact below
    2^53; float-summed columns can differ in the last ulp across
    partitionings — profile those with rounded tolerance, not hash
    equality). The driver-side ``round`` here is Python's
    (banker's); a mean landing EXACTLY on a 5 at the 7th decimal
    could round differently than a half-away-from-zero engine —
    astronomically unlikely for real means, tolerable for a drift
    report, noted for honesty.
    """
    from concurrent.futures import ThreadPoolExecutor

    from .stats import profile_stats

    # The two sides are independent scans whose driver actions would
    # otherwise run back to back; submitting them from two driver
    # threads lets the scheduler overlap their jobs (r11, guide §5 —
    # wall = max(side) instead of sum). Results are collected per
    # side into separate dicts, so ordering between the threads
    # cannot affect the output.
    def _side(df):
        return {
            r["column"]: r
            for r in profile_stats(df, list(columns), exact=exact).collect()
        }

    with ThreadPoolExecutor(max_workers=2) as pool:
        fo, fn = pool.submit(_side, old), pool.submit(_side, new)
        po, pn = fo.result(), fn.result()

    def frac(r):
        return (r["n_null"] / r["n"]) if r["n"] else 0.0

    def mean(r):
        return r["mean"]

    rows = []
    for c in columns:
        a, b = po[c], pn[c]
        fa, fb = frac(a), frac(b)
        ma, mb = mean(a), mean(b)
        rows.append((
            c, a["n"], b["n"],
            round(fa, 6), round(fb, 6), round(fb - fa, 6),
            a["n_distinct"], b["n_distinct"],
            round(ma, 6) if ma is not None else None,
            round(mb, 6) if mb is not None else None,
            round(mb - ma, 6) if ma is not None and mb is not None else None,
        ))
    return old.sparkSession.createDataFrame(
        rows,
        "column string, n_old long, n_new long, null_frac_old double, "
        "null_frac_new double, null_frac_delta double, ndv_old long, "
        "ndv_new long, mean_old double, mean_new double, mean_delta double",
    )
