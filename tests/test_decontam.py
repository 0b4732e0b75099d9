"""Decontamination + incremental dedup operator tests (known-answer
fixtures, plan-shape checks, and the bloom-pruning conf context)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flycatcher_spark import plans
from flycatcher_spark.operators import decontam, dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    # doc 1 verbatim-copies the benchmark; doc 2 shares half its
    # grams; doc 3 is clean; doc 4 is too short to shingle.
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma zeta eta theta"),
            (3, "one two three four five six"),
            (4, "hi there"),
        ],
        "doc_id long, text string",
    )


@pytest.fixture(scope="module")
def bench_docs(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")],
        "doc_id long, text string",
    )


class TestContamination:
    def test_report_counts(self, corpus, bench_docs):
        rows = {
            r["doc_id"]: r
            for r in decontam.contamination_report(
                corpus, bench_docs, n=3
            ).collect()
        }
        # benchmark has trigrams: {a b g, b g d, g d e} (3 grams)
        assert rows[1]["n_grams"] == 3 and rows[1]["n_matched"] == 3
        assert rows[1]["contamination_frac"] == 1.0
        assert rows[1]["is_contaminated"] is True
        # doc 2 trigrams: {a b g, b g z, g z e, z e t} -> 1 of 4 match
        assert rows[2]["n_grams"] == 4 and rows[2]["n_matched"] == 1
        assert rows[2]["is_contaminated"] is False
        assert rows[3]["n_matched"] == 0
        # short doc: no grams, reported (not dropped), zero frac
        assert rows[4]["n_grams"] == 0
        assert rows[4]["contamination_frac"] == 0.0
        assert rows[4]["is_contaminated"] is False

    def test_decontaminate_keeps_clean(self, corpus, bench_docs):
        kept = sorted(
            r["doc_id"]
            for r in decontam.decontaminate(corpus, bench_docs).collect()
        )
        assert kept == [2, 3, 4]

    def test_benchmark_side_broadcasts(self, corpus, bench_docs):
        report = decontam.contamination_report(corpus, bench_docs)
        r = plans.plan_report(report)
        assert r.broadcast_hash_joins >= 1, r.summary()


class TestIncrementalDedup:
    def test_exact_drops_corpus_and_batch_dups(self, spark):
        corpus = spark.createDataFrame(
            [(1, "seen before"), (2, "also seen")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                (10, "Seen   BEFORE"),  # normalizes to corpus doc 1
                (11, "brand new"),
                (12, "brand  NEW"),  # in-batch dup of 11 (higher id)
                (13, "unique text"),
            ],
            "doc_id long, text string",
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup.incremental_exact_dedup(new, corpus).collect()
        )
        assert kept == [11, 13]

    def test_minhash_drops_corpus_near_dup_only(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog near the old "
            "river bank on a quiet summer morning before sunrise"
        )
        corpus = spark.createDataFrame(
            [(1, base), (2, "completely different corpus text here "
                            "about astronomy and telescopes and stars")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [
                # one-word edit of corpus doc 1 -> near-dup, dropped
                (10, base.replace("quiet", "calm")),
                # unrelated -> survives
                (11, "an entirely unrelated document regarding "
                     "cooking recipes soups and hearty winter stews"),
            ],
            "doc_id long, text string",
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup.incremental_minhash_dedup(
                new, corpus, verify_threshold=0.5
            ).collect()
        )
        assert kept == [11]

    def test_minhash_batch_internal_dups_survive(self, spark):
        """Incremental dedup is against the corpus only — two new
        docs duplicating each other both survive (within-batch dedup
        is minhash_dedup's job)."""
        corpus = spark.createDataFrame(
            [(1, "some corpus document full of plain filler words "
                 "that overlaps with nothing in the new batch")],
            "doc_id long, text string",
        )
        twin = (
            "twin documents share every single token in this "
            "sentence exactly as written with no edits at all"
        )
        new = spark.createDataFrame(
            [(10, twin), (11, twin)], "doc_id long, text string"
        )
        kept = sorted(
            r["doc_id"]
            for r in dedup.incremental_minhash_dedup(new, corpus).collect()
        )
        assert kept == [10, 11]


class TestBloomPruning:
    def test_conf_restored(self, spark):
        before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        with plans.runtime_bloom_pruning(spark):
            assert (
                spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
            )
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before

    def test_bloom_filter_injected(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_totalprice") > 150000)
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        joined = li.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        ).groupBy("l_returnflag").agg(F.count("*").alias("n"))
        with plans.runtime_bloom_pruning(spark):
            plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan

    def test_values_identical_with_and_without(self, spark):
        orders = spark.read.parquet(f"{SF}/orders.parquet").filter(
            F.col("o_totalprice") > 150000
        )
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        joined = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("l_returnflag")
            .agg(F.count("*").alias("n"))
        )
        plain = {(r["l_returnflag"], r["n"]) for r in joined.collect()}
        with plans.runtime_bloom_pruning(spark):
            pruned = {(r["l_returnflag"], r["n"]) for r in joined.collect()}
        assert plain == pruned


class TestVerbatimOverlap:
    FILLER_A = " ".join(f"fa{i}" for i in range(20))
    FILLER_B = " ".join(f"fb{i}" for i in range(20))
    QUOTE = "alpha beta gamma delta epsilon zeta"

    @pytest.fixture(scope="class")
    def data(self, spark):
        corpus = spark.createDataFrame(
            [
                # long doc with a verbatim 6-token benchmark quote:
                # tiny gram FRACTION, real leak
                (1, f"{self.FILLER_A} {self.QUOTE} {self.FILLER_B}"),
                (2, "totally unrelated clean content about engines"),
                (3, "hi"),  # too short to gram
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, self.QUOTE)], "doc_id long, text string"
        )
        return corpus, bench

    def test_span_detected_where_fraction_misses(self, data):
        corpus, bench = data
        rows = {
            r["doc_id"]: r
            for r in decontam.verbatim_overlap_report(
                corpus, bench, n=3, min_span_tokens=5
            ).collect()
        }
        # 6-token quote -> 4 consecutive matched trigrams -> span 6
        assert rows[1]["max_span_tokens"] == 6
        assert rows[1]["n_flagged_spans"] == 1
        assert rows[1]["is_contaminated"] is True
        # the gram FRACTION is tiny: fraction-based overlap would
        # not flag this doc at any reasonable threshold
        frac = {
            r["doc_id"]: r["contamination_frac"]
            for r in decontam.contamination_report(
                corpus, bench, n=3, frac_threshold=0.5
            ).collect()
        }
        assert frac[1] < 0.12
        # clean + too-short docs report zeros, never dropped
        assert rows[2]["max_span_tokens"] == 0
        assert rows[2]["is_contaminated"] is False
        assert rows[3]["n_grams"] == 0
        assert rows[3]["is_contaminated"] is False

    def test_two_separate_spans_counted(self, spark):
        bench = spark.createDataFrame(
            [(100, "one two three four"), (101, "five six seven eight")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [(1, f"one two three four {self.FILLER_A} five six seven eight")],
            "doc_id long, text string",
        )
        row = decontam.verbatim_overlap_report(
            corpus, bench, n=3, min_span_tokens=4
        ).first()
        assert row["n_flagged_spans"] == 2
        assert row["max_span_tokens"] == 4

    def test_min_span_threshold_gates_flag(self, data):
        corpus, bench = data
        rows = {
            r["doc_id"]: r
            for r in decontam.verbatim_overlap_report(
                corpus, bench, n=3, min_span_tokens=7
            ).collect()
        }
        assert rows[1]["max_span_tokens"] == 6
        assert rows[1]["is_contaminated"] is False
