"""Streaming incremental dedup: replay-to-batch equivalence.

Three document files arrive as separate micro-batches
(maxFilesPerTrigger=1, mtime-ordered); the accepted table after the
stream drains must equal one batch call of
``incremental_exact_dedup`` over all new docs — proof that the
foreachBatch corpus-growing loop implements the same semantics
across batch boundaries (a duplicate of an *earlier batch's*
survivor is dropped, not just duplicates of the seed corpus).
"""

from __future__ import annotations

import os
import time

from flycatcher_spark.operators.dedup import incremental_exact_dedup
from flycatcher_spark.streaming import incremental_dedup_stream

SCHEMA = "doc_id long, text string"


def _write_file(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for name in os.listdir(path):
        os.utime(os.path.join(path, name), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_stream_equals_batch_incremental(spark, tmp_path):
    corpus_rows = [
        (1, "seed document one about rivers"),
        (2, "seed document two about mountains"),
    ]
    corpus = spark.createDataFrame(corpus_rows, SCHEMA)

    batches = [
        [
            (10, "fresh batch-one doc"),
            (11, "Seed Document ONE about rivers"),  # dup of corpus 1
        ],
        [
            (20, "fresh batch-two doc"),
            (21, "fresh  batch-one DOC"),  # dup of batch-1 survivor 10
            (22, "another original text"),
        ],
        [
            (30, "another  ORIGINAL text"),  # dup of batch-2 survivor 22
            (31, "completely new in batch three"),
            (32, "completely NEW in batch three"),  # in-batch dup of 31
        ],
    ]

    src = tmp_path / "incoming"
    src.mkdir()
    # One file per micro-batch; mtimes force arrival order so the
    # stream processes ids in increasing order (the batch min-id rule
    # then describes the same survivor set).
    base = time.time() - 1000
    files = []
    for i, rows in enumerate(batches):
        staging = str(tmp_path / f"stage{i}")
        _write_file(spark, staging, rows, base + i * 10)
        files.append(staging)
    # move staged part-files into the watched dir in order
    for i, staging in enumerate(files):
        for name in os.listdir(staging):
            if name.endswith(".parquet"):
                dst = str(src / f"batch{i}.parquet")
                os.rename(os.path.join(staging, name), dst)
                os.utime(dst, (base + i * 10, base + i * 10))

    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    accepted_dir = str(tmp_path / "accepted")
    seen_epochs = []
    q = incremental_dedup_stream(
        sdf,
        corpus,
        accepted_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        on_batch=lambda kept, epoch: seen_epochs.append(epoch),
    )
    q.awaitTermination(120)

    assert len(seen_epochs) == 3  # one epoch per file

    streamed = {
        r["doc_id"] for r in spark.read.parquet(accepted_dir).collect()
    }
    all_new = spark.createDataFrame(
        [r for b in batches for r in b], SCHEMA
    )
    batch_equiv = {
        r["doc_id"]
        for r in incremental_exact_dedup(all_new, corpus).collect()
    }
    assert streamed == batch_equiv
    # and the expected survivors, spelled out:
    assert streamed == {10, 20, 22, 31}


def test_gated_stream_equals_gated_batch(spark, tmp_path):
    """Quality-gated streaming ingest: rejects quarantine to the
    dead-letter dir, survivors match the batch pipeline (gate then
    incremental dedup) exactly."""
    from flycatcher_spark.operators import quality

    corpus = spark.createDataFrame(
        [(1, "the seed text is about rivers and stones")], SCHEMA
    )
    batches = [
        [
            (10, "the fresh doc talks of rivers and the hills beyond"),
            (11, "x"),  # fails the word-count gate -> quarantine
        ],
        [
            (20, "the FRESH doc talks OF rivers and the hills beyond"),  # dup of 10
            (21, "to be or not to be that is the question here friend"),
        ],
    ]
    src = tmp_path / "incoming"
    src.mkdir()
    base = time.time() - 1000
    for i, rows in enumerate(batches):
        staging = str(tmp_path / f"gstage{i}")
        _write_file(spark, staging, rows, base + i * 10)
        for name in os.listdir(staging):
            if name.endswith(".parquet"):
                dst = str(src / f"batch{i}.parquet")
                os.rename(os.path.join(staging, name), dst)
                os.utime(dst, (base + i * 10, base + i * 10))

    gate = quality.gopher_pass(
        "text", min_words=5, min_stopword_hits=1, min_alpha_word_ratio=0.5
    )
    sdf = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(src))
    )
    accepted_dir = str(tmp_path / "gaccepted")
    rejected_dir = str(tmp_path / "grejected")
    q = incremental_dedup_stream(
        sdf,
        corpus,
        accepted_dir,
        checkpoint_dir=str(tmp_path / "gckpt"),
        gate=gate,
        rejected_dir=rejected_dir,
    )
    q.awaitTermination(120)

    streamed = {r["doc_id"] for r in spark.read.parquet(accepted_dir).collect()}
    rejected = {r["doc_id"] for r in spark.read.parquet(rejected_dir).collect()}
    all_new = spark.createDataFrame([r for b in batches for r in b], SCHEMA)
    batch_equiv = {
        r["doc_id"]
        for r in incremental_exact_dedup(all_new.where(gate), corpus).collect()
    }
    assert streamed == batch_equiv == {10, 21}
    assert rejected == {11}
    # nothing lost: every input doc is accepted, rejected, or a dup
    dropped_as_dup = {20}
    assert streamed | rejected | dropped_as_dup == {10, 11, 20, 21}


VEC_SCHEMA = "vec_id long, embedding array<double>, label int"


def _write_vec_file(spark, path, rows, mtime):
    df = spark.createDataFrame(rows, VEC_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(path)
    for name in os.listdir(path):
        os.utime(os.path.join(path, name), (mtime, mtime))
    os.utime(path, (mtime, mtime))


def test_semantic_stream_equals_sequential_batches(spark, tmp_path):
    """Streamed embedding ingest == the same micro-batches applied
    sequentially in batch mode (incremental vs accepted, then
    within-batch semantic dedup, survivors accumulate)."""
    from flycatcher_spark.operators.quality import (
        incremental_semantic_dedup,
        semantic_dedup,
    )
    from flycatcher_spark.streaming import incremental_semantic_dedup_stream

    corpus_rows = [
        (1, [1.0, 0.0, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [1.0, 0.0, 0.0], 1),   # same direction, other cluster
    ]
    corpus = spark.createDataFrame(corpus_rows, VEC_SCHEMA)

    batches = [
        [
            (10, [1.0, 0.001, 0.0], 0),   # near-dup of seed 1: dropped
            (11, [0.0, 0.0, 1.0], 0),     # orthogonal: survives
            (12, [0.0, 0.001, 1.0], 0),   # within-batch dup of 11: dropped
        ],
        [
            (20, [0.0, 0.002, 1.0], 0),   # near-dup of batch-1 SURVIVOR 11
            (21, [0.0, 1.0, 0.0], 1),     # new direction in cluster 1
            (22, [0.7, 0.7, 0.0], 0),     # genuinely new: survives
        ],
        [
            (30, [0.7, 0.701, 0.0], 0),   # near-dup of batch-2 survivor 22
            (31, [0.0, 0.999, 0.001], 1), # near-dup of batch-2 survivor 21
            (32, [0.5, 0.0, 0.5], 1),     # survives
        ],
    ]

    src = str(tmp_path / "vec_src")
    os.makedirs(src, exist_ok=True)
    base = time.time() - 1000
    for i, rows in enumerate(batches):
        _write_vec_file(spark, f"{src}/b{i}", rows, base + i * 60)

    accepted_dir = str(tmp_path / "vec_accepted")
    q = incremental_semantic_dedup_stream(
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*"),
        corpus,
        accepted_dir,
        str(tmp_path / "vec_ckpt"),
        threshold=0.97,
    )
    q.awaitTermination(120)

    streamed = sorted(
        r["vec_id"] for r in spark.read.parquet(accepted_dir).collect()
    )

    # batch-mode replay of the same micro-batches, in order
    target = corpus
    expected = []
    for rows in batches:
        b = spark.createDataFrame(rows, VEC_SCHEMA)
        fresh = incremental_semantic_dedup(b, target, threshold=0.97)
        kept = semantic_dedup(fresh, threshold=0.97)
        expected.extend(r["vec_id"] for r in kept.collect())
        target = target.unionByName(kept)

    assert streamed == sorted(expected)
    # sanity on the planted fixture itself
    assert 10 not in streamed and 12 not in streamed   # dup of seed / in-batch
    assert 20 not in streamed and 30 not in streamed   # dup of earlier survivor
    assert {11, 21, 22, 32} <= set(streamed)


# ---------------------------------------------------------------------------
# exactly-once: replaying an epoch must be a no-op
# ---------------------------------------------------------------------------
def _table_fingerprint(spark, path):
    """(sorted ids, file count) — catches both logical duplication and
    physical re-appends."""
    df = spark.read.parquet(path)
    id_col = "doc_id" if "doc_id" in df.columns else "vec_id"
    ids = sorted(r[id_col] for r in df.collect())
    return ids


def test_exact_ingest_epoch_replay_idempotent(spark, tmp_path):
    """Retrying a foreachBatch epoch after its write (executor loss /
    driver restart) must leave the accepted AND rejected tables
    unchanged — the exactly-once guarantee of the per-epoch dynamic
    partition overwrite."""
    from flycatcher_spark.operators import quality
    from flycatcher_spark.streaming import make_ingest_processor

    corpus = spark.createDataFrame(
        [(1, "the seed text is about rivers and stones")], SCHEMA
    )
    accepted_dir = str(tmp_path / "eo_accepted")
    rejected_dir = str(tmp_path / "eo_rejected")
    gate = quality.gopher_pass(
        "text", min_words=5, min_stopword_hits=1, min_alpha_word_ratio=0.5
    )
    process = make_ingest_processor(
        corpus, accepted_dir, gate=gate, rejected_dir=rejected_dir
    )

    b0 = spark.createDataFrame(
        [
            (10, "the fresh doc talks of rivers and the hills beyond"),
            (11, "x"),  # gate reject -> dead-letter
        ],
        SCHEMA,
    )
    b1 = spark.createDataFrame(
        [
            (20, "the FRESH doc talks OF rivers and the hills beyond"),  # dup of 10
            (21, "to be or not to be that is the question here friend"),
        ],
        SCHEMA,
    )
    process(b0, 0)
    process(b1, 1)
    acc_before = _table_fingerprint(spark, accepted_dir)
    rej_before = _table_fingerprint(spark, rejected_dir)
    assert acc_before == [10, 21] and rej_before == [11]

    # replay BOTH epochs (same epoch id, same batch — what Structured
    # Streaming redelivers after a failure between write and commit)
    process(b0, 0)
    process(b1, 1)
    assert _table_fingerprint(spark, accepted_dir) == acc_before
    assert _table_fingerprint(spark, rejected_dir) == rej_before

    # and a third replay of just the latest epoch
    process(b1, 1)
    assert _table_fingerprint(spark, accepted_dir) == acc_before


def test_semantic_ingest_epoch_replay_idempotent(spark, tmp_path):
    """Same exactly-once pin for the embedding ingest stream."""
    from flycatcher_spark.streaming import make_semantic_ingest_processor

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0], 0), (2, [0.0, 1.0, 0.0], 0)], VEC_SCHEMA
    )
    accepted_dir = str(tmp_path / "eo_vec_accepted")
    process = make_semantic_ingest_processor(
        corpus, accepted_dir, threshold=0.97
    )
    b0 = spark.createDataFrame(
        [
            (10, [1.0, 0.001, 0.0], 0),  # near-dup of seed 1: dropped
            (11, [0.0, 0.0, 1.0], 0),    # survives
        ],
        VEC_SCHEMA,
    )
    b1 = spark.createDataFrame(
        [
            (20, [0.0, 0.002, 1.0], 0),  # near-dup of epoch-0 survivor 11
            (21, [0.7, 0.7, 0.0], 0),    # survives
        ],
        VEC_SCHEMA,
    )
    process(b0, 0)
    process(b1, 1)
    before = _table_fingerprint(spark, accepted_dir)
    assert before == [11, 21]

    process(b0, 0)
    process(b1, 1)
    process(b1, 1)
    assert _table_fingerprint(spark, accepted_dir) == before
