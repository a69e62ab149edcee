"""Time named registry entries standalone at an arbitrary SF dir — the
8-vs-32-core scaling probe at the synthetic 10x set (VERDICT r15 ask #3).

Same session style as bench.py (warm tables + python workers, min-of-N
timed collect()s per entry, jvm/udf host canary) so the two core-count
sessions are comparable.  Results append as one JSON line each to
plans/r16/scale_bench.jsonl; the analysis table lands in SCALE.md.

Usage:
  SPARK_GRAFT_CPUS=32 PYTHONPATH=/root/repo python tools/scale_bench.py \
      --sf-dir /root/repo/.scratch/scaled/sf10x0.1 --reps 3 name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    if "--sf-dir" in argv:
        i = argv.index("--sf-dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    if "--reps" in argv:
        i = argv.index("--reps")
        reps = int(argv[i + 1])
        del argv[i : i + 2]
    names = argv
    if not names:
        print("no entries given", file=sys.stderr)
        return 1

    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark
    from sparkml_som_spark.sources import TABLE_NAMES, load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(f"scale-bench-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).count()
    from pyspark.sql import functions as F

    def _identity(v):
        return v * 1.0

    _udf = F.pandas_udf(_identity, "double")
    spark.range(1024).repartition(int(cpus)).select(_udf(F.col("id").cast("double"))).count()

    def _timed(fn) -> float:
        t0 = time.time()
        fn()
        return time.time() - t0

    def jvm_run():
        spark.range(400_000_000).selectExpr("sum(id * 2651 % 97)").collect()

    def udf_run():
        spark.range(2_000_000).repartition(int(cpus)).select(
            _udf(F.col("id").cast("double")).alias("v")
        ).selectExpr("sum(v)").collect()

    jvm_run()
    udf_run()
    canary = {
        "jvm_sec": round(min(_timed(jvm_run) for _ in range(3)), 3),
        "udf_sec": round(min(_timed(udf_run) for _ in range(3)), 3),
    }

    queries = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"scale:{name}")
        try:
            fn(spark, sf_dir).collect()  # untimed warm/steady pass
            out[name] = round(
                min(_timed(lambda: fn(spark, sf_dir).collect()) for _ in range(reps)), 3
            )
        except Exception as e:
            out[name] = -1.0
            print(f"SCALE ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: {out[name]}", file=sys.stderr)

    line = {
        "cpus": int(cpus),
        "sf_dir": sf_dir,
        "reps": reps,
        "canary": canary,
        "timings": out,
    }
    with open(os.path.join(REPO, "plans", "r16", "scale_bench.jsonl"), "a") as f:
        f.write(json.dumps(line) + "\n")
    print(json.dumps(line))
    spark.stop()
    return 0


if __name__ == "__main__":
    main()
