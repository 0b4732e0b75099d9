"""Tests for operators.sketch — mergeable md5-deterministic HLL and
count-min sketches. The cross-engine cell parity itself is pinned by
the ``hll_distinct`` / ``cms_heavy_hitters`` oracle queries; these
tests pin the algebra: merge laws, error bounds, determinism across
partitionings, and null semantics."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from flycatcher_spark.operators import sketch


@pytest.fixture(scope="module")
def keys(spark):
    # 2000 distinct keys, skewed repetition (key i appears (i % 7) + 1
    # times) — enough to leave the HLL small-range regime at p=8
    rows = [(i, f"user-{i}") for i in range(2000) for _ in range((i % 7) + 1)]
    return spark.createDataFrame(rows, "id long, user string")


def _registers_dict(df):
    return {r["register"]: r["max_rho"] for r in df.collect()}


class TestHLL:
    def test_estimate_within_theoretical_error(self, keys):
        # sigma = 1.04/sqrt(m); 2000 true ndv, p=8 -> expect within ~4 sigma
        row = sketch.hll_estimate(keys, "user", p=8).collect()[0]
        sigma = 1.04 / math.sqrt(256)
        assert abs(row["hll_ndv"] - 2000) / 2000 < 4 * sigma
        assert 0 < row["n_registers"] <= 256

    def test_partitioning_invariance(self, keys):
        # the sketch is a max-monoid: any repartitioning yields the
        # exact same registers and estimate
        a = sketch.hll_estimate(keys, "user", p=12).collect()[0]
        b = sketch.hll_estimate(keys.repartition(17), "user", p=12).collect()[0]
        assert a["denom_scaled"] == b["denom_scaled"]
        assert a["hll_ndv"] == b["hll_ndv"]

    def test_merge_equals_whole(self, keys):
        # sketch(first half) MERGE sketch(second half) == sketch(all)
        lo = keys.filter(F.col("id") < 1000)
        hi = keys.filter(F.col("id") >= 1000)
        merged = sketch.hll_merge(
            sketch.hll_registers(lo, "user", p=8),
            sketch.hll_registers(hi, "user", p=8),
        )
        whole = sketch.hll_registers(keys, "user", p=8)
        assert _registers_dict(merged) == _registers_dict(whole)
        est_m = sketch.hll_estimate(merged, from_registers=True, p=8).collect()[0]
        est_w = sketch.hll_estimate(keys, "user", p=8).collect()[0]
        assert est_m["hll_ndv"] == est_w["hll_ndv"]

    def test_merge_is_idempotent_on_overlap(self, keys):
        # overlapping halves merge to the same sketch (set semantics)
        lo = keys.filter(F.col("id") < 1500)
        hi = keys.filter(F.col("id") >= 500)
        merged = sketch.hll_merge(
            sketch.hll_registers(lo, "user", p=8),
            sketch.hll_registers(hi, "user", p=8),
        )
        assert _registers_dict(merged) == _registers_dict(
            sketch.hll_registers(keys, "user", p=8)
        )

    def test_nulls_skipped(self, spark):
        df = spark.createDataFrame(
            [("a",), ("b",), (None,), (None,)], "k string"
        )
        regs = sketch.hll_registers(df, "k", p=8)
        assert regs.count() == 2  # two distinct non-null keys, two registers

    def test_grouped(self, keys):
        grouped = keys.withColumn("g", F.col("id") % 2)
        out = {r["g"]: r for r in
               sketch.hll_estimate(grouped, "user", ["g"], p=8).collect()}
        assert set(out) == {0, 1}
        for r in out.values():
            assert abs(r["hll_ndv"] - 1000) / 1000 < 0.3

    def test_rejects_unaligned_p(self, keys):
        with pytest.raises(ValueError, match="hex-aligned"):
            sketch.hll_registers(keys, "user", p=10)


class TestCMS:
    def test_overestimate_only_and_exact_for_distinct_cells(self, keys):
        # CMS never under-counts; with 2000 keys in 4x1024 cells some
        # collide, but min-over-rows keeps estimates >= truth
        sk = sketch.cms_sketch(keys, "user")
        true = keys.groupBy("user").agg(F.count(F.lit(1)).alias("n"))
        est = sketch.cms_lookup(sk, true.select("user"), "user")
        joined = {
            r["user"]: (r["n"], r["cms_est"])
            for r in true.join(est, "user").collect()
        }
        assert len(joined) == 2000
        assert all(e >= n for n, e in joined.values())
        # 2000 keys over 1024 buckets is ~2 per bucket: P(a key sits
        # alone in one row) ~ e^-2, so P(exact over 4 rows) ~
        # 1-(1-e^-2)^4 ~ 0.44 — demand a safely-below floor
        exact_frac = sum(1 for n, e in joined.values() if e == n) / 2000
        assert exact_frac > 0.3

    def test_weighted_build_equals_raw_stream(self, keys):
        # sketch(raw occurrences) == sketch(counted, weight_col) —
        # the production/demo equivalence the cms_heavy_hitters
        # oracle query relies on
        raw = sketch.cms_sketch(keys, "user")
        counts = keys.groupBy("user").agg(F.count(F.lit(1)).alias("n"))
        weighted = sketch.cms_sketch(counts, "user", weight_col="n")
        raw_cells = {(r["row"], r["bucket"]): r["cnt"] for r in raw.collect()}
        w_cells = {(r["row"], r["bucket"]): r["cnt"] for r in weighted.collect()}
        assert raw_cells == w_cells

    def test_merge_equals_whole(self, keys):
        lo = keys.filter(F.col("id") < 1000)
        hi = keys.filter(F.col("id") >= 1000)
        merged = sketch.cms_merge(
            sketch.cms_sketch(lo, "user"), sketch.cms_sketch(hi, "user")
        )
        whole = sketch.cms_sketch(keys, "user")
        m = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
        w = {(r["row"], r["bucket"]): r["cnt"] for r in whole.collect()}
        assert m == w

    def test_lookup_missing_key_is_bounded(self, spark, keys):
        # a key never inserted probes 4 cells; its estimate is the
        # collision mass there — >= 0 and far below the corpus total
        sk = sketch.cms_sketch(keys, "user")
        ghost = spark.createDataFrame([("never-seen-key",)], "user string")
        est = sketch.cms_lookup(sk, ghost, "user").collect()[0]
        total = keys.count()
        assert 0 <= est["cms_est"] < total / 10

    def test_sketch_size_bounded(self, keys):
        sk = sketch.cms_sketch(keys, "user", depth=3, width=64)
        assert sk.count() <= 3 * 64
        assert sk.select(F.max("row")).collect()[0][0] <= 2
        assert sk.select(F.max("bucket")).collect()[0][0] <= 63

    def test_merge_requires_input(self):
        with pytest.raises(ValueError):
            sketch.cms_merge()
        with pytest.raises(ValueError):
            sketch.hll_merge()


class TestStreamingHLL:
    def test_complete_mode_registers_match_batch(self, spark, keys, tmp_path):
        """The register max-monoid is exactly what Structured
        Streaming's stateful aggregation needs: stream the same keys
        in three arrival chunks and the complete-mode register table
        after the last micro-batch must equal the batch sketch —
        incremental ingest needs no special code path, just the same
        groupBy(register).max(rho)."""
        import uuid

        src = str(tmp_path / "keys")
        chunks = [
            keys.where(F.col("id") % 3 == i).select("user") for i in range(3)
        ]
        chunks[0].coalesce(1).write.mode("append").parquet(src)

        sdf = spark.readStream.schema("user string").parquet(src)
        regs = sketch.hll_registers(sdf, "user", p=8)
        name = f"hll_{uuid.uuid4().hex[:8]}"
        q = (
            regs.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
            for i in (1, 2):
                chunks[i].coalesce(1).write.mode("append").parquet(src)
                q.processAllAvailable()
            got = {
                r["register"]: r["max_rho"]
                for r in spark.table(name).collect()
            }
        finally:
            q.stop()
        want = _registers_dict(sketch.hll_registers(keys, "user", p=8))
        assert got == want
