"""Benchmark decontamination for training-data pipelines.

A training corpus must not contain the evaluation benchmarks it will
be judged against. The standard defense (n-gram overlap, as published
for GPT-2/GPT-3-style training sets) flags any training document that
shares word n-grams with a benchmark document.

Scale shape (the 100 TB design):

- The benchmark side is small (eval sets are MBs, not TBs): its
  distinct hashed n-grams build once and **broadcast** to every
  executor — no shuffle of the corpus is ever keyed on grams.
- The corpus side is a map-only explode (doc -> distinct n-grams)
  followed by a broadcast-hash join and a partial-aggregated
  ``groupBy(doc_id)``: the only shuffle carries one small row per
  document (id, partial match count), never the text or the grams.
- Gram strings are replaced by ``xxhash64`` before the join: 8-byte
  keys instead of multi-word strings through the broadcast hash table.
  Two distinct grams colliding in 64 bits is ~1e-15 per benchmark —
  negligible against the n-gram heuristic's own noise floor.

Beyond the reference surface (north-star scale extension); the
reference's nearest feature is row-level membership validation
(is_in), which this generalizes to set-overlap between tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import word_shingles
from .text import bind_once, normalize_text, tokens


def benchmark_ngram_hashes(
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Distinct hashed word n-grams of the benchmark corpus.

    One column ``gram_hash: bigint``. Build once per benchmark
    release and persist/broadcast; at production scale write it out
    as a small parquet side table.
    """
    return (
        benchmark.select(
            F.explode(word_shingles(text_col, n)).alias("__gram")
        )
        .select(F.xxhash64("__gram").alias("gram_hash"))
        .distinct()
    )


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    frac_threshold: float = 0.5,
) -> DataFrame:
    """Per-document benchmark-overlap statistics.

    Returns one row per corpus document:

    - ``n_grams``: distinct word n-grams in the document,
    - ``n_matched``: how many of those appear in the benchmark,
    - ``contamination_frac``: ``n_matched / n_grams`` (0.0 for
      gram-less documents), rounded to 6 places,
    - ``is_contaminated``: frac >= ``frac_threshold``.

    Documents too short to produce an n-gram are reported with zero
    counts (explode_outer keeps them), never silently dropped.
    """
    from ..plans import ensure_min_parallelism

    bench = F.broadcast(
        benchmark_ngram_hashes(benchmark, text_col=text_col, n=n)
        .withColumn("__hit", F.lit(1))
    )
    # shingling is CPU-bound: widen an under-partitioned scan before
    # it (a small corpus in one 128 MB split would shingle serially)
    corpus = ensure_min_parallelism(corpus, key=id_col)
    grams = corpus.select(
        F.col(id_col), word_shingles(text_col, n).alias("__grams")
    ).select(
        id_col,
        F.size("__grams").alias("n_grams"),
        F.explode_outer("__grams").alias("__gram"),
    )
    hits = grams.withColumn("gram_hash", F.xxhash64("__gram")).join(
        bench, on="gram_hash", how="left"
    )
    per_doc = hits.groupBy(id_col).agg(
        F.first("n_grams").alias("n_grams"),
        F.coalesce(F.sum("__hit"), F.lit(0)).cast("bigint").alias("n_matched"),
    )
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.col("n_matched") / F.col("n_grams")
    )
    return per_doc.select(
        id_col,
        F.col("n_grams").cast("bigint").alias("n_grams"),
        "n_matched",
        F.round(frac, 6).alias("contamination_frac"),
        (F.round(frac, 6) >= F.lit(frac_threshold)).alias("is_contaminated"),
    )


def positional_gram_hashes(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Word n-grams of normalized text WITH their token positions:
    ``(id, __pos, gram_hash)``. Map-only (sequence -> transform ->
    posexplode); docs shorter than ``n`` tokens emit nothing. The
    token array binds once per row (``text.bind_once``) so the
    per-position lambda never re-runs the tokenize chain.
    """

    def build(tk):
        n_grams = F.greatest(F.size(tk) - (n - 1), F.lit(0))
        idx = F.when(
            n_grams > 0, F.sequence(F.lit(0), n_grams - 1)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i + 1, n)))
        )

    hashed = bind_once(tokens(normalize_text(text_col)), build)
    return df.select(
        F.col(id_col),
        F.posexplode(hashed).alias("__pos", "gram_hash"),
    )


def verbatim_overlap_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_span_tokens: int = 16,
) -> DataFrame:
    """Exact-contamination detector: the LONGEST verbatim token span
    each corpus document shares with the benchmark, via runs of
    consecutive matching n-grams.

    Fraction-based overlap (:func:`contamination_report`) misses a
    long verbatim quote inside a long document (small fraction, real
    leak); this catches it: a run of ``k`` consecutive position-
    matched n-grams implies a shared span of ``k + n - 1`` tokens.
    Span detection is gaps-and-islands — matched positions minus
    their per-doc rank collapse each run to one group key.

    Scale shape: benchmark grams hash + broadcast (never a gram-keyed
    shuffle); corpus side is a map-only positional explode, a
    broadcast semi-join, then windows/aggregates all partitioned by
    ``id`` — the shuffle carries only matched (id, pos) pairs, which
    contamination makes rare by nature.

    Returns one row per corpus doc: ``(id, n_grams, max_span_tokens,
    n_flagged_spans, is_contaminated)`` — zero-filled for clean or
    too-short docs, flagged when any span reaches
    ``min_span_tokens``.
    """
    from ..plans import ensure_min_parallelism

    bench = F.broadcast(
        benchmark_ngram_hashes(benchmark, text_col=text_col, n=n)
    )
    # positional shingling is CPU-bound: widen an under-partitioned
    # scan before it (see contamination_report)
    corpus = ensure_min_parallelism(corpus, key=id_col)
    grams = positional_gram_hashes(
        corpus, text_col=text_col, id_col=id_col, n=n
    )
    matched = grams.join(bench, "gram_hash", "left_semi")
    w = Window.partitionBy(id_col).orderBy("__pos")
    islands = matched.withColumn(
        "__grp", F.col("__pos") - F.row_number().over(w)
    )
    spans = islands.groupBy(id_col, "__grp").agg(
        (F.count(F.lit(1)) + (n - 1)).cast("bigint").alias("__span_toks")
    )
    per_doc = spans.groupBy(id_col).agg(
        F.max("__span_toks").alias("max_span_tokens"),
        F.sum(
            F.when(F.col("__span_toks") >= min_span_tokens, 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_flagged_spans"),
    )
    totals = grams.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_grams")
    )
    base = corpus.select(id_col).join(totals, id_col, "left").join(
        per_doc, id_col, "left"
    )
    return base.select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("bigint").alias("n_grams"),
        F.coalesce("max_span_tokens", F.lit(0))
        .cast("bigint")
        .alias("max_span_tokens"),
        F.coalesce("n_flagged_spans", F.lit(0))
        .cast("bigint")
        .alias("n_flagged_spans"),
        (F.coalesce("n_flagged_spans", F.lit(0)) > 0).alias(
            "is_contaminated"
        ),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    frac_threshold: float = 0.5,
) -> DataFrame:
    """Corpus rows whose benchmark n-gram overlap stays below the
    threshold (the rows safe to train on).

    Anti-joins the corpus against the flagged ids from
    :func:`contamination_report`; all columns of ``corpus`` survive.
    """
    flagged = (
        contamination_report(
            corpus,
            benchmark,
            text_col=text_col,
            id_col=id_col,
            n=n,
            frac_threshold=frac_threshold,
        )
        .where(F.col("is_contaminated"))
        .select(id_col)
    )
    return corpus.join(flagged, on=id_col, how="left_anti")
