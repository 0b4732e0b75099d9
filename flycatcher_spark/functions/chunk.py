"""Document chunking: fixed-size token windows with overlap.

The training-data shape: split each document into windows of
``size`` tokens advancing by ``size - overlap``, keeping a short tail
window. Two implementations with identical output:

- :func:`chunk_documents` — pure Catalyst (``sequence`` →
  ``posexplode`` → ``slice`` → ``array_join``). The scale path: no
  Python, chunk explosion happens executor-side after filters have
  been pushed to the scan, and the explode multiplies rows *after*
  column pruning so only the token array is widened.
- :class:`ChunkTokens` — the same semantics as an Arrow-batched UDTF,
  registered by :func:`flycatcher_spark.functions.register_sql` as
  ``chunk_text`` for ``spark.sql`` lateral use. Exists to demonstrate
  the table-function extension point; prefer the Catalyst version in
  pipelines.

Chunk count for n tokens: 0 if n == 0 else 1 + ceil(max(0, n - size)
/ step). The last window may be shorter than ``size`` but is never
empty, and every token is covered at least once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..operators.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    size: int = 32,
    overlap: int = 8,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """Explode documents into overlapping token windows.

    Returns ``id_cols + (chunk_idx, chunk_text, n_chunk_tokens)``;
    documents with no tokens produce no rows.
    """
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    if id_cols is None:
        id_cols = [c for c in df.columns if c != text_col]
    step = size - overlap

    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.lit(1) + F.ceil((F.greatest(n - size, F.lit(0))) / F.lit(step))
    )
    staged = df.select(
        *id_cols, toks.alias("__toks"), n_chunks.cast("int").alias("__n_chunks")
    )
    window = F.slice(
        F.col("__toks"), F.col("chunk_idx").cast("int") * step + 1, size
    )
    return (
        # sequence(0, n-1) counts DOWNWARD for n <= 0 — filter empties
        # out before exploding.
        staged.filter(F.col("__n_chunks") > 0)
        .select(
            *id_cols,
            "__toks",
            F.explode(F.sequence(F.lit(0), F.col("__n_chunks") - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            *id_cols,
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            F.array_join(window, " ").alias("chunk_text"),
            F.size(window).cast("bigint").alias("n_chunk_tokens"),
        )
    )


@udtf(returnType="chunk_idx: bigint, chunk_text: string, n_chunk_tokens: bigint")
class ChunkTokens:
    """``chunk_text(text, size, overlap)`` table function (same
    semantics as :func:`chunk_documents`)."""

    def eval(self, text: str, size: int, overlap: int):
        if text is None or not 0 <= overlap < size:
            return
        toks = text.split()
        if not toks:
            return
        step = size - overlap
        idx = 0
        for start in range(0, len(toks), step):
            window = toks[start : start + size]
            yield idx, " ".join(window), len(window)
            if start + size >= len(toks):
                break
            idx += 1
