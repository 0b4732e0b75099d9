"""Measured dynamic-vs-compiled robots-gate crossover (VERDICT r8 #4).

The compiled gate trades a FIXED cost (one bounded collect + Janino
compiling the per-host WHEN chain) for a lower PER-ROW cost (literal
startswith/rlike inside WholeStageCodegen, no join, no argmax
shuffle). At the oracle fixture's scale (5k URLs at sf0.1) the fixed
cost dominates and the dynamic path wins; this tool measures both
paths over a synthetic URL table at growing row counts — fixed
50-host ruleset, same rule mix as the oracle fixture — and records
where the per-row savings overtake the setup cost.

Usage:
    python tools/robots_crossover.py              # measure + print
    python tools/robots_crossover.py --update     # + rewrite
                                                  #   robots_crossover.json

Protocol matches bench.py's spirit: per (n, impl) one untimed warm
run then min over 3 timed noop-sink runs on a quiet machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROW_COUNTS = [100_000, 1_000_000, 10_000_000]
N_HOSTS = 50
RUNS = 2

_ROBOTS = (
    "User-agent: evilbot\nDisallow: /\n\n"
    "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
    "Disallow: /tmp/*.log\nAllow: /tmp/keep.log$\n"
)


def main() -> int:
    update = "--update" in sys.argv
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from flycatcher_spark.operators import web

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    hosts = spark.createDataFrame(
        [(f"h{i}.example.com", _ROBOTS) for i in range(N_HOSTS)],
        "host string, robots_txt string",
    )
    rules = web.robots_rules(hosts, agent="flycatcher")
    rules.persist().count()  # the dynamic path's rule table, built once

    def urls(n: int):
        v = F.col("id") % 5
        path = (
            F.when(v == 0, F.concat(F.lit("/public/"), F.col("id")))
            .when(v == 1, F.concat(F.lit("/private/"), F.col("id")))
            .when(v == 2, F.concat(F.lit("/private/ok/"), F.col("id")))
            .when(v == 3, F.concat(F.lit("/tmp/f"), F.col("id"), F.lit(".log")))
            .otherwise(F.lit("/tmp/keep.log"))
        )
        return spark.range(n).select(
            F.concat(
                F.lit("https://h"),
                F.col("id") % N_HOSTS,
                F.lit(".example.com"),
                path,
            ).alias("url")
        )

    def run_one(n: int, impl: str) -> float:
        src = urls(n)
        gate_rules = hosts if impl == "compiled" else rules
        best = float("inf")
        for r in range(RUNS + 1):  # first is the untimed warm run
            t0 = time.monotonic()
            web.robots_gate(
                src, gate_rules, impl=impl, agent="flycatcher"
            ).write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            if r > 0:
                best = min(best, dt)
        return round(best, 3)

    out = {
        "n_hosts": N_HOSTS,
        "runs": f"min of {RUNS} after 1 warm, noop sink",
        "points": [],
    }
    crossover = None
    for n in ROW_COUNTS:
        dyn = run_one(n, "dynamic")
        comp = run_one(n, "compiled")
        point = {"rows": n, "dynamic_sec": dyn, "compiled_sec": comp}
        out["points"].append(point)
        print(json.dumps(point))
        if crossover is None and comp < dyn:
            crossover = n
    out["crossover_rows"] = crossover
    print(json.dumps({"crossover_rows": crossover}))
    if update:
        path = os.path.join(REPO, "robots_crossover.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
