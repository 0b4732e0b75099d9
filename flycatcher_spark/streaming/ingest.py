"""Streaming ingest dedup: the corpus-growing foreachBatch pattern.

Production corpora are not built in one batch job — documents arrive
continuously and each micro-batch must be deduplicated against
everything already accepted (the static seed corpus AND the survivors
of every earlier batch). This wires
:func:`~flycatcher_spark.operators.dedup.incremental_exact_dedup`
into ``foreachBatch``:

- per batch, the accepted-so-far table is read back and unioned with
  the seed corpus — the corpus side contributes only its distinct
  fingerprint column to the anti-join, so batch cost scales with the
  batch (see SCALE.md);
- survivors append to the accepted table, becoming the dedup target
  for the next batch: a within-stream duplicate is dropped even
  across micro-batches, without any in-memory operator state (the
  accepted table IS the state — restart-safe and inspectable).

Exactly-once caveat: a plain parquet append re-appends the epoch's
survivors if the batch is retried after the write. For production,
write per-epoch partitions (``accepted_dir/epoch=<id>``, overwrite
mode) or an ACID table format; the epoch id is passed through for
exactly that.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import incremental_exact_dedup


def incremental_dedup_stream(
    sdf: DataFrame,
    corpus: DataFrame,
    accepted_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    available_now: bool = True,
    on_batch: Callable[[DataFrame, int], None] | None = None,
    gate: Column | None = None,
    rejected_dir: str | None = None,
) -> StreamingQuery:
    """Run streaming incremental dedup; survivors accumulate in
    ``accepted_dir`` (parquet). Returns the started query.

    ``gate`` (optional) is any boolean Column applied to each
    micro-batch BEFORE dedup — the streaming quality gate (e.g.
    ``quality.gopher_pass(...) & (quality.classifier_score(...) >=
    0.6)``); rows failing it are quarantined to ``rejected_dir`` when
    given (the dead-letter pattern: nothing silently disappears),
    otherwise dropped. Because the gate is row-local, gating per
    micro-batch is exactly equivalent to gating the whole stream in
    one batch job — pinned by the replay-equivalence test.

    ``on_batch(kept, epoch_id)`` runs after each batch's survivors
    are computed (metrics, side outputs); ``available_now=True``
    drains the source and stops — the backfill/test mode.
    """
    spark = sdf.sparkSession
    cols = [id_col, text_col]
    seed = corpus.select(*cols)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        cached = None
        if gate is not None and rejected_dir is not None:
            # two sinks read the batch: cache it once, release it when
            # both writes are done (else cached blocks accumulate in
            # executor storage for the lifetime of the stream)
            cached = batch = batch.persist()
        try:
            if gate is not None:
                if rejected_dir is not None:
                    batch.where(~F.coalesce(gate, F.lit(False))).write.mode(
                        "append"
                    ).parquet(rejected_dir)
                batch = batch.where(F.coalesce(gate, F.lit(False)))
            try:
                accepted = spark.read.parquet(accepted_dir).select(*cols)
                target = seed.unionByName(accepted)
            except AnalysisException:  # first epoch: no accepted table yet
                target = seed
            kept = incremental_exact_dedup(
                batch, target, text_col=text_col, id_col=id_col
            )
            kept.write.mode("append").parquet(accepted_dir)
            if on_batch is not None:
                on_batch(kept, epoch_id)
        finally:
            if cached is not None:
                cached.unpersist()

    writer = (
        sdf.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_semantic_dedup_stream(
    sdf: DataFrame,
    corpus: DataFrame,
    accepted_dir: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    threshold: float = 0.97,
    available_now: bool = True,
    on_batch: Callable[[DataFrame, int], None] | None = None,
) -> StreamingQuery:
    """Streaming EMBEDDING ingest dedup: the semantic counterpart of
    :func:`incremental_dedup_stream` — each micro-batch of vectors is
    deduplicated against everything already accepted (the static seed
    corpus AND every earlier batch's survivors), then within itself.

    Per batch, in order:

    1. :func:`~flycatcher_spark.operators.quality.incremental_semantic_dedup`
       drops batch vectors cosine-similar (>= ``threshold``) to any
       same-cluster accepted vector — per-cluster new x corpus BLAS
       blocks, never a corpus self-join, so batch cost scales with
       the batch;
    2. :func:`~flycatcher_spark.operators.quality.semantic_dedup`
       collapses near-duplicates WITHIN the surviving batch (min-id
       representative per transitive component);
    3. survivors append to ``accepted_dir`` — the accepted table IS
       the operator state (restart-safe, inspectable), exactly the
       exact-dedup stream's contract.

    Semantics note (inherent to greedy ingest, documented rather than
    hidden): acceptance is arrival-order greedy. A later vector is
    compared against accepted SURVIVORS only — if it is a near-dup of
    an earlier batch's *dropped* vector but not of any survivor, it
    survives; a single all-at-once batch run could instead chain them
    into one component. This matches how production semantic-dedup
    ingest behaves (SemDeDup applied incrementally); the equivalence
    test pins stream == the same batches applied sequentially in
    batch mode, and single-batch streams == one batch call exactly.

    Same exactly-once caveat as :func:`incremental_dedup_stream`:
    plain parquet append re-appends on epoch retry; use per-epoch
    partitions or an ACID format in production.
    """
    from ..operators.quality import incremental_semantic_dedup, semantic_dedup

    spark = sdf.sparkSession
    cols = [id_col, vec_col, cluster_col]
    seed = corpus.select(*cols)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        try:
            accepted = spark.read.parquet(accepted_dir).select(*cols)
            target = seed.unionByName(accepted)
        except AnalysisException:  # first epoch: no accepted table yet
            target = seed
        fresh = incremental_semantic_dedup(
            batch.select(*cols),
            target,
            id_col=id_col,
            vec_col=vec_col,
            cluster_col=cluster_col,
            threshold=threshold,
        )
        kept = semantic_dedup(
            fresh,
            id_col=id_col,
            vec_col=vec_col,
            cluster_col=cluster_col,
            threshold=threshold,
        )
        kept.write.mode("append").parquet(accepted_dir)
        if on_batch is not None:
            on_batch(kept, epoch_id)

    writer = (
        sdf.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
