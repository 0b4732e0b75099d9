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
- survivors are written to a **per-epoch partition**
  (``accepted_dir/epoch=<id>``) with dynamic partition overwrite,
  becoming the dedup target for the next batch: a within-stream
  duplicate is dropped even across micro-batches, without any
  in-memory operator state (the accepted table IS the state —
  restart-safe and inspectable).

Exactly-once: epoch-partitioned writes make batch replay idempotent.
If an epoch is retried after its write (executor loss, driver
restart), the retry (a) excludes its own epoch's partition from the
dedup target, so it recomputes the identical survivor set from the
identical inputs (Structured Streaming replays the same offsets per
epoch), and (b) overwrites only its own partition — the accepted
table after N attempts of an epoch equals the table after one.
Pinned by ``tests/test_streaming_ingest.py`` replay tests, which
invoke the batch processor twice with the same epoch id. The same
pattern quarantines gate rejects (``rejected_dir/epoch=<id>``), so
the dead-letter table cannot double-count a retried epoch either.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import incremental_exact_dedup

#: Partition column for per-epoch idempotent writes.
EPOCH_COL = "epoch"


def write_epoch_partition(df: DataFrame, path: str, epoch_id: int) -> None:
    """Write ``df`` to ``path/epoch=<id>`` with dynamic partition
    overwrite — the exactly-once sink primitive: replaying the same
    epoch replaces its own partition and touches no other.

    Examples
    --------
        >>> df = spark.range(3).withColumnRenamed("id", "doc_id")
        >>> d = str(getfixture("tmp_path") / "acc")
        >>> write_epoch_partition(df, d, 7)
        >>> write_epoch_partition(df, d, 7)  # replay: no duplication
        >>> spark.read.parquet(d).count()
        3
    """
    (
        df.withColumn(EPOCH_COL, F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(EPOCH_COL)
        .parquet(path)
    )


def read_accepted(
    spark, accepted_dir: str, cols: list[str], exclude_epoch: int | None = None
) -> DataFrame | None:
    """Read the accepted table back as dedup state, or ``None`` if no
    epoch has written yet. ``exclude_epoch`` drops that epoch's own
    partition — a retrying epoch must not dedup against its previous
    attempt's output (partition pruning: the excluded partition is
    never scanned).

    Examples
    --------
        >>> d = str(getfixture("tmp_path") / "never_written")
        >>> read_accepted(spark, d, ["doc_id"]) is None
        True
    """
    from pyspark.errors import AnalysisException

    try:
        acc = spark.read.parquet(accepted_dir)
    except AnalysisException:  # first epoch: no accepted table yet
        return None
    if exclude_epoch is not None:
        acc = acc.where(F.col(EPOCH_COL) != int(exclude_epoch))
    return acc.select(*cols)


def make_ingest_processor(
    corpus: DataFrame,
    accepted_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    on_batch: Callable[[DataFrame, int], None] | None = None,
    gate: Column | None = None,
    rejected_dir: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the exact-dedup ``foreachBatch`` processor. Exposed
    separately from the stream wrapper so the exactly-once guarantee
    is directly testable: call it twice with the same ``epoch_id`` and
    the accepted (and rejected) tables must be unchanged."""
    spark = corpus.sparkSession
    cols = [id_col, text_col]
    seed = corpus.select(*cols)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        cached = None
        if gate is not None and rejected_dir is not None:
            # two sinks read the batch: cache it once, release it when
            # both writes are done (else cached blocks accumulate in
            # executor storage for the lifetime of the stream)
            cached = batch = batch.persist()
        try:
            if gate is not None:
                if rejected_dir is not None:
                    write_epoch_partition(
                        batch.where(~F.coalesce(gate, F.lit(False))),
                        rejected_dir,
                        epoch_id,
                    )
                batch = batch.where(F.coalesce(gate, F.lit(False)))
            accepted = read_accepted(
                spark, accepted_dir, cols, exclude_epoch=epoch_id
            )
            target = seed if accepted is None else seed.unionByName(accepted)
            kept = incremental_exact_dedup(
                batch, target, text_col=text_col, id_col=id_col
            )
            write_epoch_partition(kept, accepted_dir, epoch_id)
            if on_batch is not None:
                on_batch(kept, epoch_id)
        finally:
            if cached is not None:
                cached.unpersist()

    return _process


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
    ``accepted_dir`` (parquet, one partition per epoch). Returns the
    started query.

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
    _process = make_ingest_processor(
        corpus,
        accepted_dir,
        text_col=text_col,
        id_col=id_col,
        on_batch=on_batch,
        gate=gate,
        rejected_dir=rejected_dir,
    )
    writer = (
        sdf.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_semantic_ingest_processor(
    corpus: DataFrame,
    accepted_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    threshold: float = 0.97,
    on_batch: Callable[[DataFrame, int], None] | None = None,
) -> Callable[[DataFrame, int], None]:
    """Build the semantic-dedup ``foreachBatch`` processor (see
    :func:`make_ingest_processor` for why it is exposed): incremental
    semantic dedup vs accepted state, within-batch semantic dedup,
    then an idempotent per-epoch partition write."""
    from ..operators.quality import incremental_semantic_dedup, semantic_dedup

    spark = corpus.sparkSession
    cols = [id_col, vec_col, cluster_col]
    seed = corpus.select(*cols)

    def _process(batch: DataFrame, epoch_id: int) -> None:
        accepted = read_accepted(
            spark, accepted_dir, cols, exclude_epoch=epoch_id
        )
        target = seed if accepted is None else seed.unionByName(accepted)
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
        write_epoch_partition(kept, accepted_dir, epoch_id)
        if on_batch is not None:
            on_batch(kept, epoch_id)

    return _process


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
    3. survivors land in ``accepted_dir/epoch=<id>`` — the accepted
       table IS the operator state (restart-safe, inspectable), and
       the per-epoch dynamic partition overwrite makes epoch replay
       idempotent (the exact-dedup stream's contract).

    Semantics note (inherent to greedy ingest, documented rather than
    hidden): acceptance is arrival-order greedy. A later vector is
    compared against accepted SURVIVORS only — if it is a near-dup of
    an earlier batch's *dropped* vector but not of any survivor, it
    survives; a single all-at-once batch run could instead chain them
    into one component. This matches how production semantic-dedup
    ingest behaves (SemDeDup applied incrementally); the equivalence
    test pins stream == the same batches applied sequentially in
    batch mode, and single-batch streams == one batch call exactly.
    """
    _process = make_semantic_ingest_processor(
        corpus,
        accepted_dir,
        id_col=id_col,
        vec_col=vec_col,
        cluster_col=cluster_col,
        threshold=threshold,
        on_batch=on_batch,
    )
    writer = (
        sdf.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
