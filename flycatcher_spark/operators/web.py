"""Web-corpus operators: URL canonicalization and URL-keyed dedup.

Crawled corpora key almost everything on the URL — recrawl dedup,
per-host caps, domain mixing — and the same page arrives under
textually different URLs (scheme/host case, default ports, tracking
parameters, fragments, trailing slashes). :func:`canonical_url`
collapses those variants with a pure Column expression (map-only,
whole-stage codegen — at 100 TB canonicalization costs the scan), and
:func:`url_dedup` keeps one best row per canonical URL with an
exact_dedup-shaped slim shuffle (key + id + preference columns only;
page payloads never enter the exchange).

Every transformation is deliberately regex/string-builtin only so the
DuckDB oracle replays it verbatim (the ``url_dedup`` query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url", "host_of", "url_dedup", "TRACKING_PARAM_RE"]

# Query parameters that never identify content: analytics/click IDs.
# Anchored prefix match against "name=value" strings. Deliberately
# NARROW: a generic "ref" is frequently content-bearing (?ref=branch
# on code hosts), so only the known tracking variants ref_src/ref_url
# are dropped — pass a custom list to :func:`canonical_url` to widen.
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|ref_src|ref_url|mc_cid|mc_eid)="

_URL_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonical_url(
    url: Column | str, tracking_re: str = TRACKING_PARAM_RE
) -> Column:
    """Canonical form of an absolute http(s)-style URL:

    - scheme and host lowercased; a leading ``www.`` dropped
    - default ports stripped (``:80`` for http, ``:443`` for https)
    - the fragment dropped
    - tracking query parameters removed (``tracking_re``, default
      :data:`TRACKING_PARAM_RE`), the surviving parameters sorted
      bytewise
    - a single trailing slash dropped from non-root paths; an empty
      path becomes ``/``

    Strings that don't parse as ``scheme://authority...`` pass
    through unchanged (better a stable passthrough than a null for
    dedup keys). Pure Column expression — no UDF, no shuffle.

    Examples
    --------
        >>> df = spark.createDataFrame(
        ...     [("HTTPS://WWW.Example.COM:443/a/?utm_source=x&b=2&a=1#f",)],
        ...     ["url"])
        >>> df.select(canonical_url("url").alias("u")).first()["u"]
        'https://example.com/a?a=1&b=2'
    """
    u = _col(url)
    scheme = F.lower(F.regexp_extract(u, _URL_RE, 1))
    host0 = F.lower(F.regexp_extract(u, _URL_RE, 2))
    path0 = F.regexp_extract(u, _URL_RE, 3)
    query0 = F.regexp_extract(u, _URL_RE, 4)

    host1 = F.regexp_replace(host0, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host1.endswith(":80"),
        F.regexp_replace(host1, ":80$", ""),
    ).when(
        (scheme == "https") & host1.endswith(":443"),
        F.regexp_replace(host1, ":443$", ""),
    ).otherwise(host1)

    path1 = F.regexp_replace(path0, r"/$", "")
    path = F.when(path1 == "", F.lit("/")).otherwise(path1)

    params = F.array_sort(
        F.filter(
            F.split(F.regexp_replace(query0, r"^\?", ""), "&"),
            lambda x: (x != "") & ~x.rlike(tracking_re),
        )
    )
    query = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", params))
    ).otherwise(F.lit(""))

    canon = F.concat(scheme, F.lit("://"), host, path, query)
    return F.when(u.rlike(_URL_RE), canon).otherwise(u)


def host_of(url: Column | str) -> Column:
    """Registrable host of a canonicalized URL (the per-domain cap /
    domain-mixing key: compose with ``quality.cap_per_key``).

    Examples
    --------
        >>> df = spark.createDataFrame(
        ...     [("https://blog.example.com/post",)], ["url"])
        >>> df.select(host_of("url").alias("h")).first()["h"]
        'blog.example.com'
    """
    return F.regexp_extract(_col(url), _URL_RE, 2)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """One row per canonical URL: the highest ``quality_col`` wins,
    ties (and the no-quality case) break to the minimum ``id_col``.
    Returns surviving full rows plus the ``canonical_url`` column.

    Shuffle shape (the exact_dedup pattern): the groupBy carries only
    (canonical key, id, quality) — page payloads stay out of the
    exchange and come back via the id join.
    """
    curl = canonical_url(url_col).alias("__curl")
    # NULL quality must LOSE to any scored row: struct-min sorts a
    # null first field before every value, so coalesce the negated
    # quality to +inf (null-quality rows then only win an all-null
    # group, where the id tiebreak applies).
    pref = (
        F.coalesce(
            (-_col(quality_col)).cast("double"), F.lit(float("inf"))
        ).alias("__nq")
        if quality_col is not None
        else F.lit(0).alias("__nq")
    )
    keep = (
        df.select(F.col(id_col), curl, pref)
        .groupBy("__curl")
        .agg(
            F.min(F.struct(F.col("__nq"), F.col(id_col).alias("__i"))).alias(
                "__best"
            )
        )
        .select(
            F.col("__best.__i").alias(id_col),
            F.col("__curl").alias("canonical_url"),
        )
    )
    return df.join(keep, on=id_col, how="inner")
