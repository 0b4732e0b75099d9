"""Multimodal column plumbing: image/audio/video as opaque binary.

Treats media as ``binary`` payload columns with typed metadata,
processed by Arrow-batched ``mapInPandas`` — the Spark-side pattern a
100 TB multimodal pipeline needs:

- the payload never materializes on the driver;
- decode runs per Arrow batch inside Python workers (vectorized
  transfer, no per-row pickling);
- output schema is declared up front so Catalyst can plan downstream
  operators without running the Python stage.

The actual media decode (PIL/ffmpeg/soundfile) is NOT available in
this container, so :func:`decode_meta` runs a clearly-marked
**deterministic fake decode** (byte-length-derived metadata) behind
the same plumbing; swap ``_fake_decode_batch`` for a real decoder by
passing ``decode_fn``. A real decoder raising per-payload errors
should emit nulls, keeping the pipeline total.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata schema produced by the decode stage, appended to the
#: pass-through key column.
META_FIELDS = [
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("fmt", T.StringType()),
]


def attach_payload(df: DataFrame, text_col: str = "text", payload_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary payload column (UTF-8 bytes of a
    text column — stands in for real media bytes in tests)."""
    return df.withColumn(payload_col, F.encode(F.col(text_col), "UTF-8"))


def _fake_decode_batch(payloads: Any) -> dict[str, list]:
    """Deterministic stand-in for a media decoder.

    Derives metadata purely from the byte payload so the DuckDB
    oracle can reproduce it. A real decoder would parse headers here.
    """
    n_bytes, width, height, fmt = [], [], [], []
    for p in payloads:
        if p is None:
            n_bytes.append(None)
            width.append(None)
            height.append(None)
            fmt.append(None)
            continue
        n = len(p)
        n_bytes.append(n)
        width.append(n % 1024)
        height.append((n * 7) % 768)
        fmt.append("fake")
    return {"n_bytes": n_bytes, "width": width, "height": height, "fmt": fmt}


def decode_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[Any], dict[str, list]] | None = None,
) -> DataFrame:
    """Extract typed metadata from a binary payload column.

    Runs ``mapInPandas`` so the decode sees whole Arrow batches (the
    fast Python path); output schema is ``(id, n_bytes, width,
    height, fmt)``. Partitioning is preserved — this is a map-only
    stage that scales with input splits.
    """
    import pandas as pd

    decode = decode_fn or _fake_decode_batch
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), *META_FIELDS]
    )

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            meta = decode(pdf[payload_col].tolist())
            out = pd.DataFrame({id_col: pdf[id_col]})
            for k, v in meta.items():
                out[k] = v
            yield out

    return df.select(id_col, payload_col).mapInPandas(process, schema=out_schema)


def embed_payload(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    dim: int = 8,
    embed_fn: Callable[[Any, int], list] | None = None,
) -> DataFrame:
    """Media-embedding extraction plumbing: payload bytes → a
    ``dim``-wide ``array<double>`` embedding via Arrow-batched
    ``mapInPandas`` — the CLIP/wav2vec stage of a multimodal pipeline
    with the model swapped for a deterministic stand-in (no model
    runtimes in this container).

    The fake embedder is byte-bucket sums (``e[i] = sum of bytes at
    positions ≡ i (mod dim)``): integer-exact, so the DuckDB oracle
    reproduces it and downstream cosine/ANN results hash-match. Pass
    ``embed_fn(payload, dim) -> list[float]`` to swap in a real
    model; everything else (batching, declared schema, partition
    preservation, null payload → null embedding) stays.

    Map-only: at 100 TB this runs at scan speed beside the decode
    stage, and the output feeds ``operators.similarity`` unchanged.
    """
    import numpy as np
    import pandas as pd

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )

    def default_embed(payload: Any, d: int) -> list | None:
        if payload is None:
            return None
        b = np.frombuffer(bytes(payload), dtype=np.uint8)
        v = np.zeros(d, dtype=np.int64)
        np.add.at(v, np.arange(len(b)) % d, b)
        return [float(x) for x in v]

    embed = embed_fn or default_embed

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": [
                        embed(p, dim) for p in pdf[payload_col]
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(process, schema=out_schema)


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    every_n_bytes: int = 64,
) -> DataFrame:
    """Frame-sampling plumbing: emit one row per sampled "frame".

    For video, a real implementation samples every Nth frame; here the
    deterministic stand-in samples every ``every_n_bytes`` bytes of
    the payload. Demonstrates the fan-out shape (posexplode over a
    row-local sequence — no shuffle) a frame extractor needs.
    """
    n = F.length(F.col(payload_col))
    offsets = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n_bytes))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_bytes"),
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    ).select(
        id_col,
        "n_bytes",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.col("byte_offset").cast("long").alias("byte_offset"),
    )
