"""End-to-end training-data pipeline: generate/read → profile →
quality-filter → exact + transitive fuzzy dedup → chunk → split.

This is the scale-extension showcase (SURVEY.md §7.1 step 7) — every
stage is a DataFrame transformation that inherits Catalyst/AQE
scaling; see SCALE.md for the per-operator design notes. The corpus
comes from the custom Python DataSource (any size, reproducible, no
files needed); swap the format string for `spark.read.parquet` in a
real pipeline.

Run: python examples/training_data_pipeline.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flycatcher_spark import caching, sources
from flycatcher_spark.functions import chunk_documents, fingerprint
from flycatcher_spark.operators import (
    bpe,
    decontam,
    dedup,
    langid,
    quality,
    stats,
    text,
)
from flycatcher_spark.session import get_spark

DATA = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="training_data_pipeline", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    # 0. A reproducible corpus from the custom DataSource: 20k docs,
    #    every 8 consecutive ids share one text (dup clusters for the
    #    dedup stages to find). Generation is partitioned + Arrow-
    #    batched; doc_id filters push into the generator.
    sources.register(spark)
    docs = (
        spark.read.format("flycatcher_docs")
        .option("rows", 20_000)
        .option("partitions", 16)
        .option("dup_every", 8)
        .load()
    )

    # 1. Profile the raw table (one aggregation scan)
    stats.profile_stats(docs, columns=["doc_id", "lang", "n_tokens"], exact=True).show()

    # 2. Text quality + language signals (map-only, codegen'd)
    profiled = text.profile(docs)
    keep = profiled.filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5))
    print("after quality filter:", keep.count(), "/", docs.count())

    # 2a. Unicode NFC normalization (r5) — BEFORE any fingerprinting
    #     or dedup: combining sequences and precomposed forms must
    #     collapse to one representation or visually identical docs
    #     hash apart. The one Arrow-UDF stage in the pipeline (UAX #15
    #     is not expressible in Catalyst).
    keep = keep.withColumn("text", text.normalize_unicode("text"))

    # 2a'. Blocklist gate (r5, the C4 bad-word rule): whole-word hits
    #      of a curated phrase list, zero tolerance — map-only, the
    #      list rides in the plan. A real (10k+-entry) list would pass
    #      impl="kernel": one Arrow set-intersection pass whose cost
    #      is independent of list size (r6).
    keep = keep.where(quality.blocklist_pass("text", ["lorem ipsum", "xxx"]))
    print("after NFC + blocklist gate:", keep.count())

    # 2a''. Curation-grade language ID (r6): char-trigram profiles
    #       learned from a small labeled sample, broadcast, scored as
    #       a naive-Bayes argmax — replaces the stopword heuristic
    #       when the corpus mix decision depends on the label. Here
    #       the generator's lang column plays the labeled sample —
    #       NOTE the synthetic corpus's labels are uncorrelated with
    #       its (English-ish) text, so this stage demos the mechanics
    #       only; tests/test_langid.py pins real accuracy (>= 0.9
    #       held-out) on genuine multilingual prose.
    profiles = langid.train_langid_profiles(
        docs.where(F.col("doc_id") % 10 == 0), top_k=200
    )
    lang_pred = langid.langid_predict(keep, profiles)
    lang_pred.groupBy("lang_pred").count().orderBy("lang_pred").show()

    # 2b. Repetition ceiling (Gopher-style): drop docs whose duplicated
    #     trigrams cover too much of the text, and redact PII before
    #     anything downstream can memorize it (both map-only)
    rep = text.repetition_profile(keep, ns=(3,)).select(
        "doc_id", F.coalesce(F.col("dup3_char_frac"), F.lit(0.0)).alias("dup3")
    )
    keep = (
        keep.join(rep, "doc_id")
        .filter(F.col("dup3") <= 0.6)
        .withColumn("text", text.redact_pii(F.col("text")))
    )
    print("after repetition filter + PII redaction:", keep.count())

    # 3. Exact dedup (deterministic min-id representative)
    deduped = dedup.exact_dedup(
        keep.select("doc_id", "text"), subset=["text"], id_col="doc_id"
    )
    print("after exact dedup:", deduped.count())

    # 4. Fuzzy dedup with TRANSITIVE clustering: MinHash-LSH pair graph
    #    → connected components → one survivor per cluster (A~B, B~C
    #    collapses all three even if A and C never banded together)
    #    Edges are VERIFIED with exact Jaccard before clustering — one
    #    false LSH edge would merge two whole clusters. The operator's
    #    internal signature cache is released when the scope closes
    #    (r6, flycatcher_spark.caching) — long-lived sessions don't
    #    accumulate dead cached blocks; hot (band, band_hash) buckets
    #    above bucket_cap split into salted sub-group tasks (exact).
    with caching.scope():
        final = dedup.minhash_dedup_transitive(deduped, verify_threshold=0.7)
        print("after transitive minhash dedup:", final.count())

    # 4b. Benchmark decontamination: drop any doc overlapping the
    #     held-out eval set's trigrams (real docs from the test
    #     parquet stand in for a benchmark; their hashed grams
    #     broadcast — no corpus shuffle is keyed on grams)
    benchmark = spark.read.parquet(f"{DATA}/documents.parquet").where(
        F.col("doc_id") % 50 == 7
    )
    final = decontam.decontaminate(final, benchmark, frac_threshold=0.5)
    # Checkpoint the accepted corpus ONCE: everything below fans out
    # multiple actions, and without this each would re-run the whole
    # LSH + verification + decontamination lineage. On a cluster this
    # is the persisted corpus table between pipeline stages.
    final = final.localCheckpoint()
    print("after decontamination:", final.count())

    # 4c. Incremental ingest: a late-arriving batch dedups AGAINST the
    #     accepted corpus (cost scales with the batch, never a corpus
    #     self-join) — the shape every production refresh runs
    #     Half the batch re-sends already-seen documents (ids 19000+
    #     duplicate corpus texts), half is genuinely new (ids 20000+):
    #     the range filter pushes into the generator, and the re-key
    #     keeps ids globally unique as the operator requires.
    late = (
        spark.read.format("flycatcher_docs")
        .option("rows", 21_000)
        .option("partitions", 4)
        .option("dup_every", 8)
        .load()
        .filter(F.col("doc_id") >= 19_000)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    accepted = dedup.incremental_minhash_dedup(
        late, final.select("doc_id", "text"), verify_threshold=0.7
    )
    print("late batch accepted:", accepted.count(), "/", late.count())

    # 5. Chunk surviving docs into overlapping token windows (pure
    #    Catalyst: sequence → explode → slice; no Python in the path)
    chunks = chunk_documents(final, size=32, overlap=8)
    print("training chunks:", chunks.count())

    # 6. Deterministic train/val/test split + stable fingerprints —
    #    hash-based, so assignment survives reruns and repartitioning
    split = chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        fingerprint(F.col("chunk_text")).alias("fp"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(100))).alias("bucket"),
    ).withColumn(
        "split",
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "val")
        .otherwise("test"),
    )
    split.groupBy("split").count().orderBy("split").show()
    split.select("doc_id", "chunk_idx", "fp", "split").show(5)

    # 6b. LEAKAGE-SAFE split (r4): step 6 splits by doc hash, which
    #     leaks whenever a train doc is a near-duplicate of a val doc.
    #     Assign near-dup CLUSTERS to one side as a unit instead:
    #     banding proposes pairs, exact Jaccard verifies them, and the
    #     transitive closure becomes the unit of assignment.
    cand = dedup.minhash_lsh_pairs(final, threshold=0.0)
    pairs = dedup.verify_pairs_jaccard(cand, final, threshold=0.7)
    safe = quality.leakage_safe_split(final, pairs, train_pct=90)
    safe.groupBy("split").count().orderBy("split").show()

    # 7. Domain mixing: deterministic per-language sampling weights —
    #    the same rows survive on every rerun and every engine
    mixed = text.hash_stratified_sample(
        split.join(docs.select("doc_id", "lang"), "doc_id"),
        strata_col="lang",
        fractions={"en": 1.0, "de": 0.5, "fr": 0.5},
        key_col="doc_id",
        default_fraction=0.25,
    )
    mixed.groupBy("lang").count().orderBy("lang").show()

    # 8. Round-3 curation: Gopher rule gate + linear classifier floor
    #    (both map-only), then sqrt-temperature mixing when the
    #    per-source rates should FOLLOW the data instead of being
    #    hand-picked like step 7's
    gated = final.join(docs.select("doc_id", "lang"), "doc_id").where(
        quality.gopher_pass(
            "text", min_words=5, min_stopword_hits=0, min_alpha_word_ratio=0.5
        )
        & (quality.classifier_score("text") >= 0.4)
    )
    print("after rule gate + classifier floor:", gated.count())

    # 8a. Filter-chain attribution (r11): which gate ate the data —
    #     the funnel report costs ONE scan no matter how many gates,
    #     instead of re-filtering the corpus once per gate
    quality.quality_funnel(
        final.join(docs.select("doc_id", "lang"), "doc_id"),
        [
            ("gopher", quality.gopher_pass(
                "text", min_words=5, min_stopword_hits=0,
                min_alpha_word_ratio=0.5)),
            ("classifier", quality.classifier_score("text") >= 0.4),
            ("english_corpus", F.col("lang") == "en"),
        ],
    ).show()

    balanced = quality.mixture_sample(
        gated, strata_col="lang", key_col="doc_id", target_rows=1_000
    )
    balanced.groupBy("lang").count().orderBy("lang").show()

    # 8b. Token-budget recipe (r4): when the data recipe is stated in
    #     TOKENS per source ("50B code, 20B web"), budget_mix keeps a
    #     deterministic prefix of each source that fits its budget
    budgeted = quality.budget_mix(
        balanced,
        strata_col="lang",
        key_col="doc_id",
        token_count=text.token_count("text"),
        default_budget=3_000,
        budgets={"en": 6_000},
    )
    budgeted.groupBy("lang").agg(
        F.count("*").alias("docs"), F.max("cum_tokens").alias("tokens_used")
    ).orderBy("lang").show()

    # 8c. CCNet perplexity buckets (r4): train preferentially on the
    #     low-surprise head + middle, as CCNet does
    buckets = quality.ccnet_buckets(budgeted, vocab_size=500)
    buckets.groupBy("bucket").count().orderBy("bucket").show()
    curated = budgeted.join(
        buckets.where(F.col("bucket") != "tail").select("doc_id"), "doc_id"
    )
    print("after head+middle selection:", curated.count())

    # 9. Target-domain selection (DSIR): pick the docs that look most
    #    like a held-out target set, deterministically
    target = spark.read.parquet(f"{DATA}/documents.parquet").limit(200)
    matched = quality.dsir_sample(balanced, target, k=500, vocab_size=500)
    print("DSIR-selected:", matched.count())

    # 9b. Weighted sampling without replacement (r11): when the pick
    #     should favor LONG documents (weight = token count) but stay
    #     bit-reproducible across engines and re-runs — priority
    #     sampling in pure integer arithmetic
    longish = quality.weighted_sample(
        balanced.withColumn("ntok", text.token_count("text")),
        weight_col="ntok", key_col="doc_id", k=300,
    )
    print("weighted-sampled:", longish.count())

    # 10. Epoch order + fixed-length sequence packing: every token of
    #     the final corpus lands in exactly one slot of one 512-token
    #     training sequence, reproducibly; a new seed reshuffles.
    #     Token counts come from a FROZEN BPE tokenizer (r6): train
    #     once, save in the standard merges.txt format, reload and
    #     apply — exactly how a pipeline pins a public tokenizer.
    merges = bpe.learn_merges(bpe.word_counts(matched), n_merges=60)
    bpe.save_merges(merges, "/tmp/flycatcher_bpe_merges.txt")
    frozen = bpe.load_merges("/tmp/flycatcher_bpe_merges.txt")
    packed = quality.pack_sequences(
        matched.select(
            "doc_id", bpe.bpe_token_count("text", frozen).alias("ntc")
        ),
        "ntc",
        seq_len=512,
        seed="epoch0",
    )
    n_seq = packed.agg(F.countDistinct("seq_id")).collect()[0][0]
    print("training sequences:", n_seq)
    packed.orderBy("seq_id", "start_in_seq").show(8)

    # 11. Similarity search with the production ANN path (r5): train
    #     the IVF+PQ index ONCE per corpus release (bounded-sample
    #     jobs), persist it as tiny parquet side tables, then run
    #     train-free search jobs — a code-size scan (32x smaller than
    #     raw floats), probing n_probe/n_cells of it, with exact
    #     cosine re-ranking of the shortlist (recall@5 >= 0.95 on the
    #     fixture corpus; ann_recall quantifies the dials).
    from flycatcher_spark.operators import similarity

    em = spark.read.parquet(f"{DATA}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    idx_dir = "/tmp/flycatcher_ann_index"
    centroids = similarity.train_ivf_centroids(em, n_cells=8, seed=7)
    books = similarity.train_pq_codebooks(em, m=32, n_codes=16, seed=7)
    similarity.save_ivf_centroids(spark, centroids, f"{idx_dir}/ivf")
    similarity.save_pq_codebooks(spark, books, f"{idx_dir}/pq")
    hits = similarity.ivf_pq_topk(
        em,
        em.where(F.col("vec_id") < 5),
        k=3,
        n_cells=8,
        n_probe=6,
        m=32,
        n_codes=16,
        rerank=8,
        centroids=similarity.load_ivf_centroids(spark, f"{idx_dir}/ivf"),
        codebooks=similarity.load_pq_codebooks(spark, f"{idx_dir}/pq"),
    )
    hits.orderBy("query_id", "rank").show(9)

    # 12. SemDeDup with LEARNED clusters (r5): deterministic full-
    #     corpus k-means produces the blocking assignment (map-only
    #     per iteration; reproducible cell-for-cell), then semantic
    #     dedup drops near-duplicate vectors within each learned
    #     cluster — no precomputed labels anywhere.
    from flycatcher_spark.operators import cluster

    assigned = cluster.kmeans(em, k=8, n_iter=2).select(
        "vec_id", "embedding", "cluster"
    )
    sem_kept = quality.semantic_dedup(
        assigned, threshold=0.35, cluster_col="cluster"
    )
    print("semantic dedup on learned clusters:", sem_kept.count(), "/", em.count())

    # 13. Multimodal shard ingest (r7): WebDataset-style tar shards
    #     explode to (caption, image) samples row-locally — the
    #     format's adjacency contract means no shuffle — and the jpg
    #     member is genuinely JPEG-decoded in the same Arrow pass
    #     (passthrough columns avoid a join back to the samples).
    from flycatcher_spark.operators import multimodal, webdataset

    shards = webdataset.make_webdataset_payload(
        docs.select("doc_id").limit(200).repartition(8)
    )
    samples = webdataset.webdataset_samples(shards).select(
        "doc_id",
        "sample_key",
        F.element_at("parts", "txt").cast("string").alias("caption"),
        F.element_at("parts", "jpg").alias("payload"),
    )
    decoded = multimodal.decode_image_meta(
        samples, id_col="doc_id", passthrough=["sample_key", "caption"]
    )
    print("webdataset samples decoded:", decoded.count())
    decoded.select("sample_key", "caption", "width", "mean_pixel").show(3)

    # 13b. Mixed-format corpora need no pre-split: the same decode
    #      stage dispatches by magic bytes — here lossless WebP (r10,
    #      VP8L literal subset) rides next to the PNG/JPEG rows.
    webp_meta = multimodal.decode_image_meta(
        multimodal.make_webp_payload(docs.select("doc_id").limit(50))
    )
    print(
        "webp decoded:",
        webp_meta.where(F.col("fmt") == "webp").count(),
        "of 50",
    )

    # 14. Re-shard the curated output (r8): the write side of the
    #     WebDataset loop — deterministic md5-order assignment into
    #     exactly size-bounded tar shards, samples adjacent,
    #     byte-reproducible. write → read-back is the identity.
    curated_samples = webdataset.webdataset_samples(shards).select(
        "sample_key", "parts"
    )
    out_shards = webdataset.write_webdataset(
        curated_samples, samples_per_shard=64
    )
    print(
        "re-sharded:",
        [(r.shard_id, r.n_samples) for r in
         out_shards.select("shard_id", "n_samples")
         .orderBy("shard_id").collect()],
    )

    # 15. Hybrid search over the corpus (r8): BM25 lexical top-k
    #     fused with exact-cosine vector top-k by reciprocal-rank
    #     fusion — rank-only combination, no score calibration.
    from flycatcher_spark.operators import retrieval, similarity

    corpus_vec = em.join(
        docs.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    q_text = spark.createDataFrame(
        [(0, "the model data"), (1, "quality filter")],
        ["query_id", "query"],
    )
    q_vec = em.where("vec_id < 2")
    lex = retrieval.bm25_topk(docs, q_text, k=20)
    vec = similarity.brute_force_topk(corpus_vec, q_vec, k=20)
    fused = retrieval.rrf_fuse(
        [
            lex.select("query_id", "doc_id", "rank"),
            vec.select("query_id", F.col("vec_id").alias("doc_id"), "rank"),
        ],
        k=5,
    )
    print("hybrid search:")
    fused.orderBy("query_id", "rank").show(10)

    spark.stop()


if __name__ == "__main__":
    main()
