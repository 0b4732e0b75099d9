"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus the noise-proofing fields
described below.

Each query is forced with a **noop-sink write** (r4 change): the query
fully executes — every output column materialized — without result
transfer to the driver. The previous ``df.count()`` action understated
several queries because Catalyst legitimately prunes work a count
doesn't need: map-only projections lose all their columns, and left
joins whose right side is an aggregate (provably unique key) are
eliminated outright, so e.g. ``verbatim_overlap`` "ran" in 0.4s
without ever computing its n-grams. Timings from r4 on are therefore
honest but NOT comparable to r1-r3 for map-heavy queries.

r8 change — the noise-proof protocol. BENCH_r07.json was captured
while an external process load (loadavg 10+, nothing local above 2%
CPU) contaminated the host, and recorded a 2.76x "regression" that
re-runs on a quiet machine showed never happened. Three defenses now
protect the recorded numbers:

1. **min over separated passes, not median of adjacent runs.**
   External noise is strictly additive — a contaminated run is never
   FASTER than the code's true cost — so the minimum over samples is
   the robust statistic (the r7 builder note already argued this; the
   r7 verdict endorsed it). Each query is timed
   ``$SPARK_GRAFT_BENCH_RUNS`` times (default 2) in each of
   ``$SPARK_GRAFT_BENCH_PASSES`` passes (default 2) over the WHOLE
   headline list, so a query's samples are separated by minutes — a
   transient load burst cannot contaminate all of them.
2. **A per-run external-load sentinel.** Around every timed run the
   harness reads host CPU busy jiffies (/proc/stat, steal included)
   and subtracts the CPU consumed by this process tree (driver +
   JVM + Python workers, via a /proc walk); the remainder divided by
   wall time is the average number of EXTERNAL busy cores during the
   run. A run with external cores > $SPARK_GRAFT_BENCH_EXT_CORES
   (default 1.5) is marked dirty and excluded from the min. A query
   whose every sample is dirty gets extra retry runs; if all samples
   are still dirty its min is recorded anyway but the query lands in
   ``dirty_queries`` and its per-query entry carries ``dirty: true``
   in ``query_detail`` — consumers (tools/gate.py) skip, not fail,
   dirty samples.

   r12 adds the sentinel's **IO-pressure arm** (VERDICT r11 #7): the
   CPU arm is blind to disk storms — BENCH_r11 recorded
   webdataset_samples at 8.41 s vs a same-code standalone 1.97 s the
   same evening under ``clean: true``, because a host blocked on disk
   burns no external CPU. Each run now also records the
   /proc/pressure/io "some" stall-time delta over its wall; a run
   stalled more than $SPARK_GRAFT_BENCH_IO_STALL (default 0.3) of its
   duration is dirty by the same exclusion rule. Timing methodology,
   statistic and output contract are unchanged — this only widens
   what counts as a contaminated sample.
3. **A machine-state stanza in the output.** The JSON line carries
   loadavg at bench start/end, per-query loadavg before/after, the
   per-run external-core estimates, and a top-level ``clean`` flag —
   a reader can SEE whether a snapshot is trustworthy instead of
   reconstructing it forensically like r7 required.

Cross-session minima: set ``SPARK_GRAFT_BENCH_MERGE=/path/to/prev.json``
to min-merge a previous session's per-query values (same sf required)
into this run's output — the documented way to record "min of N
across >= 2 separated sessions".

r5 note (superseded by the above): medians replaced single runs
because sub-second queries showed ±0.3s noise. Each query still gets
one untimed warm run at the TARGET SF before its timed runs (cache
cleared in between): the sf0.001 warmup alone leaves some plan shapes
cold and their first timed run 3-4x steady state.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "validate_lineitem",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "events_sessions",
    "text_profile",
    "dedup_exact",
    "minhash_pairs",
    "jaccard_pairs",
    "knn_topk",
    "multimodal_meta",
    "doc_chunks",
    "nearest_centroid",
    # round-3 curation surface
    "gopher_quality",
    "curated_corpus",
    "verbatim_overlap",
    # round-4 additions: the rest of the curation path, so BENCH
    # diffs (not just plan audits) catch regressions there
    "bpe_pair_counts",   # BPE training stage (word table + pair counts)
    "bpe_apply",         # BPE application (replace-chain path)
    "span_dedup",
    "decontam_report",
    "dsir_sample",
    "pack_sequences",
    # round-4 operators
    "ccnet_buckets",
    "budget_mix",
    "leakage_safe_split",       # oracle-equality config (full recall)
    # round-5 additions
    "leakage_safe_split_prod",  # production banding — the real cost
    "image_decode",             # real PPM decode (build + parse)
    "wav_decode",               # real WAV decode
    "ivf_rerank_topk",          # ANN composite incl. index training
    "kmeans_clusters",          # exact Lloyd's: 2 fit rounds + assign
    "bigram_surprise",          # interpolated bigram LM scoring
    "url_dedup",                # URL canonicalize + best-row dedup
    "unicode_normalize",        # Arrow-UDF NFC pass (the one UDF path)
    # round-6 additions
    "png_decode",               # real PNG decode (deflate + filters)
    "langid_profiles",          # char-n-gram LM train + score + argmax
    "warc_records",             # WARC gunzip-member + record walk
    "robots_gate",              # robots.txt parse + precedence gate
    "html_extract",             # pure-Column HTML->text chain
    "embedding_quantize",       # SQ8 int8 pack (pure-Column hex path)
    # round-7 additions
    "line_dedup",               # cross-doc boilerplate-line removal
    "pagerank_hosts",           # link extract + host graph + 3 PR iters
    "cdx_index",                # WARC records -> SURT capture index
    "sitemap_urls",             # sitemap build + parse round-trip
    "audio_features",           # framed rfft over PCM payloads
    "flac_decode",              # real FLAC bitstream decode
    "jpeg_decode",              # real baseline JPEG decode
    "video_frames",             # AVI walk + sampled-frame JPEG decode
    "hits_hosts",               # hubs/authorities, 2 exact iterations
    "webdataset_samples",       # tar shard walk + sample group + decode
    "embedding_project",        # pure-Column JL projection
    "html_lines_dedup",         # block-break extraction + line dedup
    # round-8 additions
    "pagerank_redistribute",    # PR with dangling-mass conservation
    "robots_gate_compiled",     # literal-predicate codegen gate
    "webdataset_roundtrip",     # write side: re-shard + read back
    "bm25_search",              # lexical retrieval: postings + probe
    "hybrid_search",            # BM25 + cosine RRF fusion
    "wet_roundtrip",            # WET write: pack + gzip + read back
    "gif_decode",               # real GIF LZW decode
    # round-9 additions
    "gif_frames",               # animated GIF compose + sampled decode
    "pdf_extract",              # PDF xref walk + inflate + text ops
    "bpe_bytes_apply",          # byte-level BPE apply (GPT-2 pre-tok)
    "http_payloads",            # HTTP envelope strip: chunked + gzip
    "wat_roundtrip",            # WAT write: envelope JSON + read back
    "tiff_decode",              # real TIFF decode (LZW + PackBits)
    "bmp_decode",               # real BMP decode (RLE8 + padding)
    # round-10 additions
    "webp_decode",              # real lossless WebP (VP8L literal)
    "pq_rerank_topk",           # PQ ADC + full-width exact rerank
    "webp_frames",              # animated WebP canvas composition
    "zip_samples",              # ZIP-shard ingest (stored+deflated)
    "zip_roundtrip",            # ZIP write side: pack -> zip -> unpack
    # round-11 additions
    "quality_funnel",           # single-pass filter-chain attribution
    "weighted_sample",          # integer priority sampling, top-k
    "anchor_texts",             # anchor-text corpus aggregation
    "readability_scores",       # FK grade over planted sentences
    "doc_line_cleanup",         # within-doc duplicate-line removal
    "sentence_chunks",          # sentence-aware greedy chunking
    "hll_distinct",             # md5-deterministic HLL, oracle-exact
    "cms_heavy_hitters",        # count-min sketch build + top-20 probe
    "zorder_locality",          # Morton-key bucket spans (pure Column)
    "contrastive_pairs",        # hard-negative mining, exact arm
    "chat_stats",               # transcript parse + gates, one shuffle
    "containment_pairs",        # asymmetric doc-in-doc shingle overlap
    "profile_drift",            # release drift: two conditional-agg scans
]

_CLK_TCK = os.sysconf("SC_CLK_TCK") if hasattr(os, "sysconf") else 100


def _host_busy_seconds() -> float | None:
    """Total busy CPU-seconds across all host CPUs from /proc/stat
    (user+nice+system+irq+softirq+steal — steal IS external load)."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
    except OSError:
        return None
    if parts[0] != "cpu" or len(parts) < 8:
        return None
    v = [int(x) for x in parts[1:]]
    # user nice system idle iowait irq softirq steal ...
    busy = v[0] + v[1] + v[2] + v[5] + v[6] + (v[7] if len(v) > 7 else 0)
    return busy / _CLK_TCK


def _tree_cpu_seconds() -> float | None:
    """CPU-seconds consumed so far by this process and every live
    descendant (the Spark JVM and its Python workers are children,
    not reaped, so getrusage(RUSAGE_CHILDREN) misses them)."""
    try:
        entries = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    raw = f.read()
            except OSError:
                continue
            fields = raw.rsplit(")", 1)[1].split()
            # post-comm fields: 0=state 1=ppid ... 11=utime 12=stime
            entries[int(d)] = (int(fields[1]), int(fields[11]) + int(fields[12]))
    except OSError:
        return None
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in entries.items():
        kids.setdefault(ppid, []).append(pid)
    total, frontier = 0, [os.getpid()]
    while frontier:
        pid = frontier.pop()
        ent = entries.get(pid)
        if ent is None:
            continue
        total += ent[1]
        frontier.extend(kids.get(pid, []))
    return total / _CLK_TCK


def _loadavg() -> list[float] | None:
    try:
        return [round(x, 2) for x in os.getloadavg()]
    except OSError:
        return None


def _io_stall_us() -> tuple[int, int] | None:
    """Cumulative IO-pressure stall time (µs) from /proc/pressure/io
    as ``(some, full)``: ``some`` counts wall time where >= 1 task was
    blocked on IO, ``full`` where ALL non-idle tasks were. The r11
    round proved the CPU-only sentinel blind to disk storms: a run
    windows recorded webdataset_samples at 8.41 s vs a same-code
    standalone 1.97 s the same evening while the bench said
    ``clean: true`` — the host was blocked on disk, which consumes no
    external CPU. (VERDICT r11 #7.)"""
    try:
        with open("/proc/pressure/io") as f:
            txt = f.read()
    except OSError:
        return None
    vals = {}
    for line in txt.splitlines():
        parts = line.split()
        if parts and parts[0] in ("some", "full"):
            for p in parts[1:]:
                if p.startswith("total="):
                    vals[parts[0]] = int(p.split("=", 1)[1])
    if "some" not in vals or "full" not in vals:
        return None
    return vals["some"], vals["full"]


def _host_calibration() -> float:
    """Single-thread hardware speed probe: seconds to md5 64 MB of a
    fixed buffer, min of 3 (late r11). The external-load sentinel
    sees a BUSIER host, not a SLOWER one — on 2026-08-17 a clean run
    recorded every query ~1.53x over its cross-session floor because
    the VM's cores were simply slower that day. This number makes
    host speed comparable ACROSS sessions/rounds: floors recorded at
    calibration c1 and a run at calibration c2 differ by ~c2/c1
    before any code effect. Goes into the machine stanza (sidecar +
    stderr), not the size-budgeted compact line."""
    import hashlib
    import time as _t

    buf = bytes(range(256)) * 4096  # 1 MB
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        h = hashlib.md5()
        for _ in range(64):
            h.update(buf)
        best = min(best, _t.perf_counter() - t0)
    return round(best, 4)


class _RunMeter:
    """Times one run and estimates average EXTERNAL busy cores during
    it: (host busy CPU - our tree's CPU) / wall. Also records the
    run's IO-pressure stall ratio (r12, the sentinel's disk arm):
    stall-µs delta over wall. The pressure counters are host-global
    (they include our own reads), but at bench scale the inputs are
    page-cached after the warm runs, so a healthy run's ratio is ~0 —
    thresholds are calibrated generously above self-IO."""

    def __enter__(self):
        self.h0 = _host_busy_seconds()
        self.t0 = _tree_cpu_seconds()
        self.io0 = _io_stall_us()
        self.w0 = time.time()
        return self

    def __exit__(self, *exc):
        self.wall = time.time() - self.w0
        h1, t1 = _host_busy_seconds(), _tree_cpu_seconds()
        io1 = _io_stall_us()
        self.ext_cores = None
        if None not in (self.h0, self.t0, h1, t1) and self.wall > 0:
            ext = (h1 - self.h0) - (t1 - self.t0)
            self.ext_cores = max(0.0, round(ext / self.wall, 2))
        self.io_stall = None
        if self.io0 is not None and io1 is not None and self.wall > 0:
            # "some" ratio: fraction of the run's wall time with at
            # least one task on the host stalled on IO
            self.io_stall = round(
                (io1[0] - self.io0[0]) / 1e6 / self.wall, 3
            )
        return False


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))
    ext_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_EXT_CORES", "1.5"))
    # IO-pressure arm (r12): a run spending more than this fraction of
    # its wall time with tasks stalled on IO is dirty. 0.3 sits well
    # above healthy self-IO (~0 once inputs are page-cached) and well
    # below the r11 storm (webdataset_samples blocked 4-8x over).
    io_thresh = float(os.environ.get("SPARK_GRAFT_BENCH_IO_STALL", "0.3"))
    merge_path = os.environ.get("SPARK_GRAFT_BENCH_MERGE", "")
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY", "")
    if only:
        # resolve against the FULL queries() registry (HEADLINE order
        # first) so tools/scaling_curves.py can track queries before
        # or regardless of their headline promotion
        import __spark_entry__ as entry_mod

        wanted = set(only.split(","))
        registry = list(entry_mod.queries())
        headline = [q for q in HEADLINE if q in wanted] + [
            q for q in registry if q in wanted and q not in HEADLINE
        ]
        missing = wanted - set(headline)
        if missing:
            raise SystemExit(f"unknown bench queries: {sorted(missing)}")
    else:
        headline = HEADLINE

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .appName("flycatcher_spark_bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    # Warm-up, in two layers, so the timed numbers are steady-state
    # throughput rather than one-time session costs:
    # 1) generic: JVM scan path + the Python/Arrow worker pool
    #    (worker fork + Arrow init — measured ~5s once);
    # 2) per-query: run every headline query once at the SMALLEST
    #    scale factor (sf0.001) first. Whole-stage codegen is
    #    Janino-compiled per plan shape and cached; the first
    #    execution of a query pays ~4s of compilation that no repeat
    #    run (and no long-running cluster) ever pays again. The warm
    #    runs use different data (sf0.001), so nothing about the
    #    timed sf's data is pre-cached — only code paths.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from pyspark.sql import functions as F
    from pyspark.sql.pandas.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).repartition(int(cpus)).select(_warm(F.col("id"))).count()

    def run_full(df) -> None:
        # noop sink: full execution of every output column, no driver
        # transfer, no count-only plan pruning
        df.write.format("noop").mode("overwrite").save()

    def drop_all_storage() -> None:
        # clearCache() drops cached TABLES but not localCheckpoint
        # RDDs (pagerank/hits/connected-components materialize
        # results through checkpoints); in a 51-query session those
        # accumulate until driver GC notices, so drop them explicitly
        # — every run must start from the same empty storage state.
        spark.catalog.clearCache()
        for r in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            r.unpersist(False)

    warm_sf = "/root/testdata/sf0.001"
    if os.path.isdir(warm_sf) and warm_sf != sf_dir:
        for name in headline:
            try:
                run_full(qs[name](spark, warm_sf))
            except Exception as e:  # warm-up must never fail the bench
                print(f"# warmup {name} failed: {e}", file=sys.stderr)
        drop_all_storage()  # warmup checkpoints must not leak into timing

    load_start = _loadavg()

    def timed_run(name: str) -> tuple[float, float | None, float | None]:
        with _RunMeter() as m:
            run_full(qs[name](spark, sf_dir))
        # Some operators persist intermediates internally (minhash
        # signatures, LSH candidates). Each run creates its own
        # DataFrame objects so nothing is shared between runs, but the
        # cached blocks would otherwise accumulate across runs x the
        # headline set — drop them so every run starts from the same
        # storage state. The drop is outside the meter: it is harness
        # bookkeeping, not query cost.
        drop_all_storage()
        return m.wall, m.ext_cores, m.io_stall

    # runs[name] -> list of (seconds, ext_cores, io_stall); detail[name]
    # keeps the loadavg snapshots for the machine stanza.
    runs: dict[str, list[tuple[float, float | None, float | None]]] = {
        q: [] for q in headline
    }
    detail: dict[str, dict] = {q: {} for q in headline}

    for p in range(n_passes):
        for name in headline:
            if p == 0:
                # One untimed warm run AT THE TARGET SF: the sf0.001
                # warmup compiles different AQE/codegen plan shapes for
                # some queries (ivf_rerank_topk's first sf0.01 run
                # measured 3-4x its steady state). The cache is cleared
                # after the warm run too, so timed runs recompute all
                # data — only code paths stay warm.
                detail[name]["loadavg_before"] = _loadavg()
                try:
                    run_full(qs[name](spark, sf_dir))
                except Exception as e:
                    print(f"# target-sf warmup {name} failed: {e}", file=sys.stderr)
                drop_all_storage()
            for _ in range(n_runs):
                runs[name].append(timed_run(name))
            if p == n_passes - 1:
                detail[name]["loadavg_after"] = _loadavg()

    def split_clean(samples):
        # a run is dirty if EITHER metered sentinel condemns it; a
        # sentinel that could not be read cannot condemn (r8 rule)
        clean = [
            s
            for s, e, io in samples
            if (e is None or e <= ext_thresh)
            and (io is None or io <= io_thresh)
            and not (e is None and io is None)
        ]
        unmetered = [s for s, e, io in samples if e is None and io is None]
        return clean + unmetered  # no meter -> can't condemn the run

    # Retry round: a query whose EVERY sample was taken under external
    # load gets two more attempts now (the burst may have passed).
    for name in headline:
        attempts = 0
        while not split_clean(runs[name]) and attempts < 2:
            print(f"# {name}: all samples dirty, retrying", file=sys.stderr)
            runs[name].append(timed_run(name))
            attempts += 1

    timings: dict[str, float] = {}
    dirty_queries: list[str] = []
    for name in headline:
        samples = runs[name]
        clean = split_clean(samples)
        dirty = not clean
        if dirty:
            dirty_queries.append(name)
        best = min(clean) if clean else min(s for s, _, _ in samples)
        timings[name] = round(best, 3)
        detail[name].update(
            {
                "runs": [round(s, 3) for s, _, _ in samples],
                "ext_cores": [e for _, e, _ in samples],
                "io_stall": [io for _, _, io in samples],
                "n_clean": len(clean),
                "dirty": dirty,
            }
        )
        runs_s = "/".join(
            f"{s:.2f}@{e if e is not None else '?'}"
            + (f"&io{io}" if io is not None and io > io_thresh else "")
            for s, e, io in samples
        )
        flag = " DIRTY" if dirty else ""
        print(
            f"# {name}: min {best:.2f}s over {len(samples)} runs "
            f"({runs_s}){flag}",
            file=sys.stderr,
        )

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    merged_from = None
    if merge_path and os.path.exists(merge_path):
        with open(merge_path) as f:
            prev = json.load(f)
        if prev.get("sf") == sf_val:
            merged_from = merge_path
            prev_dirty = set(prev.get("dirty_queries", []))
            for name, t in prev.get("queries", {}).items():
                if name in timings and name not in prev_dirty and t < timings[name]:
                    timings[name] = t
                    if name in dirty_queries:
                        dirty_queries.remove(name)
                        detail[name]["dirty"] = False
                    detail[name]["merged_min"] = t
        else:
            print(
                f"# merge skipped: sf mismatch ({prev.get('sf')} vs {sf_val})",
                file=sys.stderr,
            )

    total = round(sum(timings.values()), 3)
    ext_seen = [
        e for d in detail.values() for e in d.get("ext_cores", []) if e is not None
    ]
    io_seen = [
        io for d in detail.values() for io in d.get("io_stall", []) if io is not None
    ]
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "protocol": {
            "stat": "min-of-clean-runs",
            "passes": n_passes,
            "runs_per_pass": n_runs,
            "ext_cores_threshold": ext_thresh,
            "merged_from": merged_from,
        },
        "dirty_queries": dirty_queries,
        "clean": not dirty_queries,
        "machine": {
            "cpus": os.cpu_count(),
            "spark_cpus": int(cpus),
            "host_calibration_sec": _host_calibration(),
            "loadavg_start": load_start,
            "loadavg_end": _loadavg(),
            "ext_cores_max": max(ext_seen) if ext_seen else None,
            "ext_cores_mean": (
                round(sum(ext_seen) / len(ext_seen), 2) if ext_seen else None
            ),
            "io_stall_threshold": io_thresh,
            "io_stall_max": max(io_seen) if io_seen else None,
            "io_stall_mean": (
                round(sum(io_seen) / len(io_seen), 3) if io_seen else None
            ),
        },
        "query_detail": detail,
    }
    # r9 change: the FULL stanza (query_detail + machine) goes to a
    # sidecar file and stderr; stdout carries ONE compact line. The
    # driver tail-captures only the last ~2000 bytes of stdout, so
    # r8's 15 KB single line was recorded as parsed:null — the compact
    # line must stay under the capture window or the official bench
    # record silently ceases to exist.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_detail.json"),
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(full, f, indent=1)
        print(f"# full detail written to {detail_path}", file=sys.stderr)
    except OSError as e:
        print(f"# could not write detail sidecar: {e}", file=sys.stderr)
    print(json.dumps(full), file=sys.stderr)

    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf_val,
        "clean": not dirty_queries,
        "dirty_queries": dirty_queries,
    }
    line = json.dumps(compact, separators=(",", ":"))
    # Hard guard: stay under the driver's tail capture (~2000 bytes)
    # with margin for a trailing newline and any stray stdout bytes.
    if len(line) > 1900:
        compact.pop("dirty_queries", None)
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1900 and compact["queries"]:
        # Drop the cheapest queries first — total stays authoritative;
        # per-query detail always survives in the sidecar.
        cheapest = min(compact["queries"], key=compact["queries"].get)
        del compact["queries"][cheapest]
        compact["queries_truncated"] = True
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
