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
