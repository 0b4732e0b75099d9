"""Conversation (chat/SFT) data preparation: turn parsing,
well-formedness gates, and trainable-mass accounting.

The multi-turn analogue of the document-quality pipeline: SFT and
preference corpora arrive as JSON transcripts (``[{"role": ...,
"content": ...}, ...]``), and the curation questions are structural —
does it parse, do roles alternate, does it start with the user and
end with the assistant, how much of the token mass is actually
trainable (assistant turns) versus masked context (user/system
turns). Each gate here is the distributed form: parse with Spark's
native ``from_json`` (JVM, codegen — a malformed transcript becomes
an attributable null row, never a stage failure), explode once, and
answer every structural question in ONE aggregation over the
exploded turns (the single-pass conditional-aggregation discipline
of ``generators/spark.py``'s validator).

At 100 TB: ``parse_turns`` is map-only (parse + posexplode, no
shuffle); ``conversation_stats`` shuffles once on conv_id with
map-side partial aggregation; all gates are then column arithmetic
on the stats row. Nothing here ever materializes a conversation on
the driver.

No reference counterpart (the reference has no conversation
surface); oracle-checked as ``chat_turns`` / ``chat_stats``, where
the oracle replays the planted transcript construction directly —
so a Spark-side parse bug cannot hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["TURN_SCHEMA", "parse_turns", "conversation_stats", "wellformed"]

#: Spark DDL schema for a transcript: the OpenAI-style message list.
TURN_SCHEMA = "array<struct<role: string, content: string>>"


def parse_turns(
    df: DataFrame,
    conv_id_col: str = "conv_id",
    json_col: str = "conv_json",
) -> DataFrame:
    """Explode JSON transcripts into one row per turn:
    ``(conv_id, turn_idx, role, content)``.

    ``from_json`` yields null for malformed JSON, and
    ``posexplode_outer`` keeps that conversation as a single
    all-null-turn row (same for an empty ``[]`` transcript), so
    downstream stats report ``parse_ok = false`` instead of silently
    dropping the document — the attributable-failure contract every
    decoder in this repo follows. Two Spark quirks callers should
    know: a lone JSON OBJECT wraps into a 1-element array (a bare
    message parses as a single-turn transcript), and unknown fields
    are dropped / missing fields null — both pinned in
    tests/test_chat.py. Map-only; no shuffle.

    Examples
    --------
        >>> df = spark.createDataFrame(
        ...     [(1, '[{"role":"user","content":"hi"},'
        ...          '{"role":"assistant","content":"hello"}]')],
        ...     "conv_id long, conv_json string")
        >>> [(r["turn_idx"], r["role"]) for r in
        ...  parse_turns(df).orderBy("turn_idx").collect()]
        [(0, 'user'), (1, 'assistant')]
    """
    return (
        df.select(
            F.col(conv_id_col).alias("conv_id"),
            F.from_json(F.col(json_col), TURN_SCHEMA).alias("__turns"),
        )
        .select(
            "conv_id",
            F.posexplode_outer("__turns").alias("turn_idx", "__t"),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.col("__t.role").alias("role"),
            F.col("__t.content").alias("content"),
        )
    )


def conversation_stats(
    turns: DataFrame,
    trainable_role: str = "assistant",
) -> DataFrame:
    """Per-conversation structural stats in one shuffle:
    ``(conv_id, parse_ok, n_turns, n_user, n_assistant, n_system,
    alternation_ok, starts_user, ends_assistant, total_chars,
    trainable_chars, trainable_ratio)``.

    ``alternation_ok`` demands no two consecutive turns share a role
    (the lag is a conv-partitioned window over turn_idx — same
    shuffle key as the aggregation, so AQE coalesces them);
    ``trainable_ratio`` is the share of characters in
    ``trainable_role`` turns — the SFT loss-mass a packed batch
    actually trains on. A conversation that failed to parse reports
    ``parse_ok = false``, zero counts, and false gates (never null —
    gates must be filterable without three-valued surprises).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    lagged = turns.withColumn(
        "__same_as_prev",
        (F.col("role") == F.lag("role").over(w)) & F.col("turn_idx").isNotNull(),
    )
    agg = lagged.groupBy("conv_id").agg(
        F.count("turn_idx").alias("n_turns"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0))
        .cast("long").alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0))
        .cast("long").alias("n_assistant"),
        F.sum(F.when(F.col("role") == "system", 1).otherwise(0))
        .cast("long").alias("n_system"),
        F.coalesce(
            ~F.max(F.coalesce(F.col("__same_as_prev"), F.lit(False))),
            F.lit(False),
        ).alias("__no_repeat"),
        (F.max(F.when(F.col("turn_idx") == 0, F.col("role"))) == "user")
        .alias("__starts_user"),
        (F.max_by(F.col("role"), F.col("turn_idx")) == "assistant")
        .alias("__ends_assistant"),
        F.coalesce(F.sum(F.length("content")), F.lit(0))
        .cast("long").alias("total_chars"),
        F.coalesce(
            F.sum(F.when(F.col("role") == trainable_role, F.length("content"))),
            F.lit(0),
        ).cast("long").alias("trainable_chars"),
    )
    parse_ok = F.col("n_turns") > 0
    return agg.select(
        "conv_id",
        parse_ok.alias("parse_ok"),
        "n_turns",
        "n_user",
        "n_assistant",
        "n_system",
        (parse_ok & F.col("__no_repeat")).alias("alternation_ok"),
        (parse_ok & F.coalesce(F.col("__starts_user"), F.lit(False)))
        .alias("starts_user"),
        (parse_ok & F.coalesce(F.col("__ends_assistant"), F.lit(False)))
        .alias("ends_assistant"),
        "total_chars",
        "trainable_chars",
        F.when(
            F.col("total_chars") > 0,
            F.round(
                F.col("trainable_chars").cast("double")
                / F.col("total_chars").cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("trainable_ratio"),
    )


def wellformed(
    stats: DataFrame,
    min_turns: int = 2,
    max_turns: int | None = None,
    min_trainable_ratio: float = 0.0,
) -> DataFrame:
    """Append the composite ``wellformed`` gate: parses, starts with
    the user, strictly alternates, ends with the assistant, and
    meets the turn/trainable-mass bounds. Pure column arithmetic on
    the stats row — filter or funnel it (``quality.quality_funnel``
    composes) without another pass over the turns."""
    gate: Column = (
        F.col("parse_ok")
        & F.col("alternation_ok")
        & F.col("starts_user")
        & F.col("ends_assistant")
        & (F.col("n_turns") >= min_turns)
        & (F.col("trainable_ratio") >= min_trainable_ratio)
    )
    if max_turns is not None:
        gate = gate & (F.col("n_turns") <= max_turns)
    return stats.withColumn("wellformed", gate)
