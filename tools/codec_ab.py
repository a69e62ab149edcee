"""Session-level A/B of `spark.io.compression.codec` (r15 cont., guide §2.3).

The codec is a core SparkConf fixed at session start, so unlike the SHJ
A/B it cannot interleave within one session.  Protocol: alternate fresh
sessions (lz4, zstd, lz4, zstd, ...), each session timing the same
shuffle-heavy subset min-of-N with the bench's jvm host canary timed in
the SAME session, so cross-session host drift can be divided out.

Optionally (--eventlog DIR) enables the Spark event log so the actual
shuffle bytes per entry can be read from task metrics afterwards
(tools/parse_eventlog.py) — the guide says to measure shuffle bytes, not
guess them.

Usage:
  PYTHONPATH=/root/repo python tools/codec_ab.py --codec lz4|zstd \
      [--reps 3] [--eventlog DIR] name [name ...]
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
    ap.add_argument("--codec", required=True, choices=["lz4", "zstd"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--eventlog", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_IO_CODEC"] = args.codec
    if args.eventlog:
        os.makedirs(args.eventlog, exist_ok=True)
        os.environ["SPARK_GRAFT_EVENTLOG_DIR"] = args.eventlog

    import __spark_entry__ as entrymod
    from sparkml_som_spark.session import get_spark

    spark = get_spark("codec-ab")
    spark.sparkContext.setLogLevel("ERROR")
    assert spark.conf.get("spark.io.compression.codec") == args.codec
    from sparkml_som_spark.sources import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _identity(v):
        return v * 1.0

    _warm = F.pandas_udf(_identity, "double")
    spark.range(1024).repartition(32).select(_warm(F.col("id").cast("double"))).count()

    # jvm host canary, bench.py-identical (untimed warm + best-of-3)
    def jvm_run():
        spark.range(400_000_000).selectExpr("sum(id * 2651 % 97)").collect()

    jvm_run()
    canary = min(
        (lambda t0: (jvm_run(), time.time() - t0)[1])(time.time()) for _ in range(3)
    )

    queries = entrymod.queries()
    out = {"codec": args.codec, "canary_jvm_sec": round(canary, 3), "entries": {}}
    for name in args.names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"codec:{name}:warm")
        fn(spark, SF_DIR).collect()  # untimed warm
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"codec:{name}")
            t0 = time.time()
            fn(spark, SF_DIR).collect()
            ts.append(round(time.time() - t0, 3))
        out["entries"][name] = {"min": min(ts), "all": ts}
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
