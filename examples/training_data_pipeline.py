"""End-to-end training-data pipeline over the synthetic documents
table: profile → quality-filter → exact + fuzzy dedup → fingerprint.

This is the scale-extension showcase (SURVEY.md §7.1 step 7) — every
stage is a DataFrame transformation that inherits Catalyst/AQE
scaling; see SCALE.md for the per-operator design notes.

Run: python examples/training_data_pipeline.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flycatcher_spark.operators import dedup, stats, text
from flycatcher_spark.session import get_spark

DATA = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="training_data_pipeline", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{DATA}/documents.parquet")

    # 1. Profile the raw table (one aggregation scan)
    stats.profile_stats(docs, columns=["doc_id", "lang", "n_chars"], exact=True).show()

    # 2. Text quality + language signals (map-only, codegen'd)
    profiled = text.profile(docs)
    keep = profiled.filter(
        (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 5)
    )
    print("after quality filter:", keep.count(), "/", docs.count())

    # 3. Exact dedup (deterministic min-id representative)
    deduped = dedup.exact_dedup(
        keep.select("doc_id", "text"), subset=["text"], id_col="doc_id"
    )
    print("after exact dedup:", deduped.count())

    # 4. Fuzzy dedup: MinHash-LSH candidates at Jaccard >= 0.7
    final = dedup.minhash_dedup(deduped, threshold=0.7)
    print("after minhash dedup:", final.count())

    # 5. Stable fingerprints for downstream joins / incremental runs
    final.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
