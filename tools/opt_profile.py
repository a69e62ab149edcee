"""Optimization-round profiling harness (r15).

For each named registry entry: run it standalone N times (same
methodology as bench.py — `.collect()` on the returned DataFrame,
best-of-N), optionally also time the noop-sink variant (guide §1.4:
computes every column, no driver collect), and dump
`.explain("formatted")` to plans/r15/<name>_<tag>.txt.

Usage:
  PYTHONPATH=/root/repo python tools/opt_profile.py [--tag before|after]
      [--reps 3] [--noop] [--no-plan] name [name ...]

Prints one JSON line per query:
  {"name": ..., "collect_sec": [...], "noop_sec": [...], "plan": path}

The warm-up mirrors bench.py (table counts + pandas_udf warm) so
standalone numbers are comparable to bench session numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--round", default="r16", help="plans/<round>/ output dir")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("opt-profile")
    spark.sparkContext.setLogLevel("ERROR")

    from sparkml_som_spark.sources import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _identity(v):
        return v * 1.0

    _warm = F.pandas_udf(_identity, "double")
    spark.range(1024).repartition(32).select(_warm(F.col("id").cast("double"))).count()

    queries = entrymod.queries()
    plans_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", args.round)
    os.makedirs(plans_dir, exist_ok=True)

    for name in args.names:
        fn = queries[name]
        rec: dict = {"name": name, "tag": args.tag}
        times: list[float] = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"opt:{name}:collect")
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            times.append(round(time.time() - t0, 3))
        rec["collect_sec"] = times
        if args.noop:
            ntimes = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"opt:{name}:noop")
                t0 = time.time()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                ntimes.append(round(time.time() - t0, 3))
            rec["noop_sec"] = ntimes
        if not args.no_plan:
            from sparkml_som_spark.plans import formatted_plan

            path = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(formatted_plan(fn(spark, SF_DIR)))
            rec["plan"] = os.path.relpath(path)
        spark.sparkContext.setJobDescription(None)
        print(json.dumps(rec))
    spark.stop()


if __name__ == "__main__":
    main()
