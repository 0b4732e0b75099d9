"""Dump ``.explain("formatted")`` for headline queries to $SPARK_GRAFT_PLANS_DIR (default plans/r12/).

Usage: python tools/dump_plans.py <suffix> [query ...]

``suffix`` is ``before`` or ``after``; with no query names, every
bench HEADLINE query is dumped. Output: <plans dir>/<query>_<suffix>.txt
(the optimization round's evidence files — the judge checks plan
claims against these).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
OUT_DIR = os.environ.get("SPARK_GRAFT_PLANS_DIR", "/root/repo/plans/r12")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if not args or args[0] not in ("before", "after"):
        raise SystemExit("usage: dump_plans.py before|after [query ...]")
    suffix = args.pop(0)
    only = set(args)

    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    import bench

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("dump_plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    os.makedirs(OUT_DIR, exist_ok=True)
    names = [q for q in bench.HEADLINE if not only or q in only]
    # allow non-headline registry queries when named explicitly
    names += [q for q in only if q not in names and q in E.queries()]
    qs = E.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 - keep dumping the rest
            plan = f"ERROR {type(e).__name__}: {e}\n"
        path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
