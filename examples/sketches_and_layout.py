"""Scale-telemetry showcase: mergeable sketches and Z-order layout.

Two patterns for the 100 TB corpus-operations loop (late r11):
1. incremental distinct counting — per-batch HyperLogLog register
   tables persisted as tiny parquet, merged across days without ever
   rescanning history (the register max-monoid);
2. count-min frequency service — build the sketch once, answer any
   number of later point queries at broadcast-join cost;
3. Z-order writes — multi-dimensional parquet stats pruning measured
   with the actual footer statistics.

Run: python examples/sketches_and_layout.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flycatcher_spark.operators import layout, sketch
from flycatcher_spark.operators.layout import ZDim
from flycatcher_spark.session import get_spark

DATA = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark(app_name="sketches_and_layout", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{DATA}/orders.parquet")

    with tempfile.TemporaryDirectory() as td:
        # 1. Incremental HLL: sketch each "day" (batch) separately,
        # persist only the registers, merge later — no rescans.
        # p=8 keeps exact ndv (1500 custkeys at sf0.01) in the HLL
        # raw-estimate regime (> 2.5*m = 640) — see sketch.hll_estimate
        # on the deliberately-omitted small-range correction
        batches = [orders.where(F.col("o_orderkey") % 3 == i) for i in range(3)]
        for i, b in enumerate(batches):
            regs = sketch.hll_registers(b, "o_custkey", p=8)
            regs.write.mode("overwrite").parquet(f"{td}/day{i}")
        partials = [spark.read.parquet(f"{td}/day{i}") for i in range(3)]
        merged = sketch.hll_merge(*partials)
        est = sketch.hll_estimate(merged, from_registers=True, p=8).first()
        exact = orders.select("o_custkey").distinct().count()
        print(f"HLL merged estimate: {est['hll_ndv']:.0f}  (exact {exact}, "
              f"{len(partials)} persisted partials, no rescan)")

        # 2. CMS as a frequency service: one build, many probes.
        priorities = orders.select(F.col("o_orderpriority").alias("k"))
        sk = sketch.cms_sketch(priorities, "k").cache()
        probe = spark.createDataFrame(
            [("1-URGENT",), ("5-LOW",), ("9-NEVER",)], "k string"
        )
        for r in sketch.cms_lookup(sk, probe, "k").orderBy("k").collect():
            print(f"CMS[{r['k']}] ~= {r['cms_est']}")

        # 3. Z-order write: footer stats prune on BOTH dims.
        part = spark.read.parquet(f"{DATA}/part.parquet")
        dims = [
            ZDim("p_size", 1, 50),
            ZDim("CAST(floor(p_retailprice) AS BIGINT)", 900, 999),
        ]
        layout.write_zorder(part, f"{td}/z", dims, bits=8, n_files=8)
        import pyarrow.parquet as pq

        survivors = 0
        for f in Path(f"{td}/z").glob("*.parquet"):
            md = pq.ParquetFile(str(f)).metadata
            st = {md.row_group(0).column(c).path_in_schema:
                  md.row_group(0).column(c).statistics
                  for c in range(md.num_columns)}
            lo, hi = st["p_size"].min, st["p_size"].max
            plo, phi = st["p_retailprice"].min, st["p_retailprice"].max
            if lo <= 15 and hi >= 10 and plo <= 950 and phi >= 920:
                survivors += 1
        print(f"Z-order box scan (size 10-15, price 920-950): "
              f"{survivors}/8 files survive stats pruning")

    spark.stop()


if __name__ == "__main__":
    main()
